"""Structured Streaming surface (SURVEY §2.10 + beyond-parity event time).

The reference's "streaming" is a filesystem watch loop driving
incremental batches (internal/watcher/file_watcher.go, 372 LoC) — no
event time, no watermarks. Here that becomes:

- source: streaming reads of the same parquet tables (schema shared with
  the batch registry, including the TIMESTAMP(NANOS) restore).
- windows: event-time twins of operators/events.py — the SAME column
  expressions, so batch and stream provably agree (tested).
- stateful: gap sessionization as a custom stateful operator
  (``applyInPandasWithState``), the idiom for operators Spark's built-in
  windows can't express.
- incremental: the watch loop itself — file source + ``foreachBatch``
  index maintenance with exactly-once file tracking via checkpoint
  (Trigger.AvailableNow for catch-up), replacing fsnotify + daemon actor.
"""

from project_cortex_spark.streaming import incremental, source, stateful, windows

__all__ = ["incremental", "source", "stateful", "windows"]
