"""Synthesize an sf1-scale dataset by 10x key-offset replication of the
driver's sf0.1 tables (the driver only ships sf<=0.1; VERDICT r4 item 7
asks for a scale-fidelity spot-check at sf1).

Each replica r offsets every entity key by r * 1e9, so joins stay
self-contained per replica and fan-outs/selectivities match sf0.1
exactly while row counts are 10x. Text gets a per-replica suffix and
embeddings a tiny first-dimension perturbation so content-based
operators (dedup, fts, knn) don't see 10 exact copies of every row.
Dimension tables (nation, region) are NOT replicated, mirroring TPC-H.

Usage: python scripts/make_sf1.py [out_dir]   (default spark-warehouse/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from project_cortex_spark.session import get_spark
from project_cortex_spark.sources.registry import read_parquet

SRC = "/root/testdata/sf0.1"
OFF = 1_000_000_000

# key columns to offset per table (all long-typed entity ids)
KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["nation", "region"]


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "spark-warehouse/sf1"
    spark = get_spark(app_name="make-sf1")
    reps = spark.range(10).select(F.col("id").alias("_r"))
    for table, keys in KEYS.items():
        df = read_parquet(spark, os.path.join(SRC, f"{table}.parquet"))
        rep = df.crossJoin(F.broadcast(reps))
        for k in keys:
            rep = rep.withColumn(k, F.col(k) + F.col("_r") * OFF)
        if table == "documents":
            rep = rep.withColumn(
                "text", F.concat(F.col("text"), F.lit(" #r"), F.col("_r"))
            )
        if table == "embeddings":
            rep = rep.withColumn(
                "embedding",
                F.concat(
                    F.array(
                        (F.element_at("embedding", 1) + F.col("_r") * 0.001
                         ).cast("float")
                    ),
                    F.slice("embedding", 2, 10_000),
                ),
            )
        rep = rep.drop("_r")
        path = os.path.join(out_dir, f"{table}.parquet")
        if table == "events":
            # range-partition the event stream source by time: the
            # streaming twins read this directory as a file stream
            # (lexicographic part order = delivery order), and a
            # randomly-shuffled layout is an adversarial out-of-order
            # stream whose watermark drops nearly every row — real
            # event feeds arrive roughly in time order
            rep = rep.repartitionByRange(8, "ts").sortWithinPartitions("ts")
            rep.write.mode("overwrite").parquet(path)
        else:
            rep.repartition(8).write.mode("overwrite").parquet(path)
        print(table, spark.read.parquet(path).count())
    for table in COPY:
        df = read_parquet(spark, os.path.join(SRC, f"{table}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{table}.parquet"))
        print(table, "copied")


if __name__ == "__main__":
    main()
