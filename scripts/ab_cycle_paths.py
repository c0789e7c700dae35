"""A/B: cycle_paths per-level min(path) encoding (VERDICT r8 item 3).

PLANS.md shows the per-level ``min(path)`` planning as SortAggregate.
Empirically in Spark 4.1 min over string, struct AND binary all plan as
SortAggregate (HashAggregate requires a mutable fixed-size buffer type;
ObjectHashAggregate only serves TypedImperativeAggregate) — so the only
available lever is the comparator cost INSIDE the sort: the current
canon compares variable-width '>'-joined decimal strings; a fixed-width
zero-padded-hex encoding compares by memcmp over equal-length byte
runs and decodes once at the end.

Note the canons differ (decimal-string lexicographic vs numeric
component order), so variant B would need the oracle CTE updated if
shipped; this script measures wall time end-to-end through the full
BFS consumer and checks cycle_len parity (path canon aside).

Usage: python scripts/ab_cycle_paths.py   (results -> SCALE.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from project_cortex_spark.operators import graph
from project_cortex_spark.operators.graph import _clamp_depth
from project_cortex_spark.session import get_spark
from project_cortex_spark.sources.registry import TableRegistry


def cycle_paths_hex(
    edges: DataFrame, *, max_len: int = 6, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Variant B: identical BFS to graph.cycle_paths, path carried as
    concatenated 16-hex-char ids (fixed width => memcmp comparator,
    numeric component canon), decoded to '>'-joined decimals at the
    end."""
    max_len = _clamp_depth(max_len)

    def hx(c):
        return F.lpad(F.lower(F.hex(c)), 16, "0")

    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d")
    ).localCheckpoint(eager=True)
    frontier = (
        e.select(
            F.col("_s").alias("origin"),
            F.col("_d").alias("node"),
            F.concat(hx(F.col("_s")), hx(F.col("_d"))).alias("path"),
        )
        .groupBy("origin", "node")
        .agg(F.min("path").alias("path"))
    )
    found = frontier.filter(F.col("node") == F.col("origin")).select(
        "origin", F.lit(1).alias("cycle_len"), "path"
    )
    frontier = frontier.filter(F.col("node") != F.col("origin")).join(
        found.select("origin"), "origin", "left_anti"
    )
    visited = frontier.select("origin", "node")
    out = [found]
    for lvl in range(2, max_len + 1):
        frontier = (
            frontier.join(e, frontier["node"] == e["_s"])
            .select(
                "origin",
                F.col("_d").alias("node"),
                F.concat(F.col("path"), hx(F.col("_d"))).alias("path"),
            )
            .groupBy("origin", "node")
            .agg(F.min("path").alias("path"))
        )
        closed = frontier.filter(F.col("node") == F.col("origin")).select(
            "origin", F.lit(lvl).alias("cycle_len"), "path"
        )
        out.append(closed)
        if lvl == max_len:
            break
        frontier = (
            frontier.filter(F.col("node") != F.col("origin"))
            .join(closed.select("origin"), "origin", "left_anti")
            .join(visited, ["origin", "node"], "left_anti")
        ).localCheckpoint(eager=True)
        visited = visited.unionByName(
            frontier.select("origin", "node")
        ).localCheckpoint(eager=True)
    res = out[0]
    for part in out[1:]:
        res = res.unionByName(part)
    agg = res.groupBy(F.col("origin").alias("node")).agg(
        F.min(F.struct(F.col("cycle_len"), F.col("path"))).alias("m")
    )
    decode = F.expr(
        "array_join(transform(sequence(0, length(m.path) div 16 - 1),"
        " i -> conv(substring(m.path, i*16+1, 16), 16, 10)), '>')"
    )
    return agg.select(
        "node", F.col("m.cycle_len").alias("cycle_len"), decode.alias("path")
    )


def ring_edges(spark, sf_dir: str) -> DataFrame:
    # same shape as __spark_entry__._ring_edges (the gated consumer)
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    reg = TableRegistry(spark)
    reg.load_dir(sf_dir, ("orders",))
    return (
        reg.table("orders")
        .select(
            F.col("o_orderkey").alias("src"),
            F.coalesce(
                F.lead("o_orderkey").over(w),
                F.min("o_orderkey").over(Window.partitionBy("o_custkey")),
            ).alias("dst"),
        )
    )


def branching_edges(spark, n: int, deg: int = 3) -> DataFrame:
    """Deterministic branching digraph with plenty of short cycles:
    i -> (a*i + c) % n for c in 1..deg."""
    return (
        spark.range(n)
        .select(F.col("id").alias("src"))
        .select(
            "src",
            F.explode(
                F.array(
                    *[
                        (F.col("src") * 31 + F.lit(c * 17 + 1)) % n
                        for c in range(3)
                    ][:deg]
                )
            ).alias("dst"),
        )
    )


def timed(fn, edges, max_len: int):
    t0 = time.time()
    rows = fn(edges, max_len=max_len).collect()
    dt = time.time() - t0
    lens = sorted((r["node"], r["cycle_len"]) for r in rows)
    return dt, len(rows), hash(tuple(lens))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-cycle-paths")
    # JVM warm-up
    timed(graph.cycle_paths, branching_edges(spark, 200), 4)

    for label, edges, max_len in (
        ("ring sf0.1 (gated consumer)", ring_edges(spark, sf_dir), 8),
        ("branching n=20k deg=3", branching_edges(spark, 20_000), 6),
    ):
        edges = edges.localCheckpoint(eager=True)
        # interleave A/B twice: the consumer, not a component
        results = {}
        for rep in range(2):
            for name, fn in (("A:decimal", graph.cycle_paths),
                             ("B:hexfw", cycle_paths_hex)):
                dt, n, h = timed(fn, edges, max_len)
                results.setdefault(name, []).append((dt, n, h))
        a, b = results["A:decimal"], results["B:hexfw"]
        assert {x[1] for x in a} == {x[1] for x in b}, "row counts diverge"
        assert {x[2] for x in a} == {x[2] for x in b}, "cycle_len sets diverge"
        print(
            f"{label}: A(decimal min) {min(x[0] for x in a):.2f}s"
            f"  B(hex fixed-width) {min(x[0] for x in b):.2f}s"
            f"  rows={a[0][1]}"
        )


if __name__ == "__main__":
    main()
