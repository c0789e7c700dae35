"""W2 branch watcher: git-HEAD change -> atomic branch swap (control plane).

Reference: ``internal/watcher/branch_watcher.go:29,66-98`` watches
``.git/HEAD`` with a 100 ms debounce and swaps the per-branch SQLite DB
under an RWMutex DBHolder (CLAUDE.md:1033-1047, swap <100 ms). SURVEY
§2.10 classifies this as control-plane, not a data stream — and that is
exactly how it lands in Spark: no locks and no state migration, because
a "branch" is an immutable parquet namespace
(``<root>/branches/<branch>/<table>.parquet``, the layout §1.4 / D11
fork_branch writes). The swap builds a complete new TableRegistry and
replaces the reference atomically; readers holding the old registry keep
consistent snapshots for as long as they like (immutable files), which is
strictly stronger than the reference's write-locked swap.

The watcher is poll-driven (``poll()``) so the host loop — a driver
thread, a scheduler tick, a StreamingQueryListener callback — owns the
cadence; the debounce mirrors the reference's collapse of rapid
checkout chatter into one swap.
"""

from __future__ import annotations

import os
import time
from typing import Callable

from pyspark.sql import SparkSession

from project_cortex_spark.sources.registry import DEFAULT_TABLES, TableRegistry


def read_head(head_path: str) -> str:
    """Branch name from a git HEAD file: ``ref: refs/heads/<branch>`` for
    a symbolic ref, else the literal content (detached SHA)."""
    with open(head_path, encoding="utf-8") as f:
        content = f.read().strip()
    if content.startswith("ref:"):
        ref = content.split(":", 1)[1].strip()
        prefix = "refs/heads/"
        return ref[len(prefix):] if ref.startswith(prefix) else ref
    return content


class BranchWatcher:
    """Polls a HEAD file and atomically re-points a TableRegistry at the
    checked-out branch's namespace, with debounce.

    ``clock`` is injectable for deterministic tests; production default is
    ``time.monotonic``.
    """

    def __init__(
        self,
        spark: SparkSession,
        branches_root: str,
        head_path: str,
        *,
        tables: tuple[str, ...] = DEFAULT_TABLES,
        debounce_ms: int = 100,
        clock: Callable[[], float] = time.monotonic,
    ):
        self.spark = spark
        self.branches_root = branches_root
        self.head_path = head_path
        self.tables = tables
        self.debounce_s = debounce_ms / 1000.0
        self.clock = clock
        self._pending: str | None = None
        self._pending_since = 0.0
        self.branch = read_head(head_path)
        self.registry = self._load(self.branch)

    def _load(self, branch: str) -> TableRegistry:
        reg = TableRegistry(self.spark)
        reg.load_dir(os.path.join(self.branches_root, branch), self.tables)
        return reg

    def poll(self) -> bool:
        """Re-read HEAD; swap once a branch change has been stable for the
        debounce window. Returns True when a swap happened. Rapid
        back-and-forth checkouts inside the window collapse to zero or
        one swap (the reference's debounce semantics)."""
        seen = read_head(self.head_path)
        now = self.clock()
        if seen == self.branch:
            self._pending = None
            return False
        if seen != self._pending:
            self._pending = seen
            self._pending_since = now
            return False
        if now - self._pending_since < self.debounce_s:
            return False
        # build the NEW registry completely, then swap the reference —
        # the atomic step is one attribute assignment; concurrent readers
        # see either the old or the new registry, never a partial one
        new_reg = self._load(seen)
        self.registry = new_reg
        self.branch = seen
        self._pending = None
        return True
