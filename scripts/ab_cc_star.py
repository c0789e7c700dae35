"""A/B: connected components on a CHAIN — the adversarial topology for
min-label propagation (component diameter = component size).

``duplicate_clusters`` (min-label) needs one full round per hop of the
chain; ``graph.connected_components`` (large-star/small-star) contracts
the same chain in O(log^2 n) rounds. This script measures wall time for
both on growing chains so SCALE.md records a number, not an estimate.

Usage: python scripts/ab_cc_star.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from project_cortex_spark.operators import dedup as dd
from project_cortex_spark.operators import graph
from project_cortex_spark.session import get_spark


def chain(spark, n: int):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["a", "b"]
    )


def timed(fn, pairs) -> tuple[float, int]:
    t0 = time.time()
    rows = fn(pairs).collect()
    dt = time.time() - t0
    roots = {r["cluster_id"] for r in rows}
    assert roots == {0}, f"expected one component rooted at 0, got {roots}"
    return dt, len(rows)


def main() -> None:
    spark = get_spark(app_name="ab-cc-star")
    # warm up the JVM so the first measurement isn't startup cost
    timed(graph.connected_components, chain(spark, 8))

    for n in (128, 512, 2048, 8192):
        star_t, nodes = timed(graph.connected_components, chain(spark, n))
        line = f"chain n={n:5d}: star={star_t:7.2f}s ({nodes} nodes)"
        if n <= 128:
            # min-label needs n-1 rounds on a chain; larger n is
            # minutes-to-hours and proves nothing further
            label_t, _ = timed(dd.duplicate_clusters, chain(spark, n))
            line += f"  min-label={label_t:7.2f}s"
        print(line, flush=True)


if __name__ == "__main__":
    main()
