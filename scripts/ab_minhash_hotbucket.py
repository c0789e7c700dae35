"""A/B: MinHash band hot-bucket guard on an adversarial boilerplate corpus
(VERDICT r6 item 2 done-criterion).

Construction: every doc = the SAME 120-word boilerplate + 3 unique words.
With shingle_n=3 the min over ~120 shared shingle hashes beats the 5
suffix shingles with overwhelming probability, so (nearly) ALL docs land
in ONE (band, bkey) bucket per band — the worst case for
`lsh_candidate_pairs`, whose within-bucket self-join is quadratic.

Measured: candidate-stage wall time, uncapped at n in {2k, 4k, 8k}
(expect ~4x per doubling once the pair join dominates) vs capped
(max_bucket=200) at n in {10k, 50k} (expect ~linear — the hot bucket is
dropped before any pair is generated). Results recorded in SCALE.md.

Usage: python scripts/ab_minhash_hotbucket.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from project_cortex_spark.operators import dedup as dd
from project_cortex_spark.session import get_spark

BOILER = " ".join(f"boiler{i:03d}" for i in range(120))


def corpus(spark, n):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit(BOILER + " "),
                F.format_string("uniq%da uniq%db uniq%dc", "id", "id", "id"),
            ).alias("text"),
        )
        .repartition(32)
    )


def run(spark, n, max_bucket):
    docs = corpus(spark, n)
    sigs = dd.minhash_signatures(docs).localCheckpoint(eager=True)
    t0 = time.time()
    cnt = dd.lsh_candidate_pairs(sigs, max_bucket=max_bucket).count()
    dt = time.time() - t0
    sigs.unpersist()
    return cnt, dt


def main():
    spark = get_spark(app_name="ab-minhash-hotbucket")
    print(f"{'n':>7} {'cap':>6} {'pairs':>12} {'cand_sec':>9}")
    for n in (2000, 4000, 8000):
        cnt, dt = run(spark, n, None)
        print(f"{n:>7} {'none':>6} {cnt:>12} {dt:>9.2f}")
    for n in (10000, 50000):
        cnt, dt = run(spark, n, 200)
        print(f"{n:>7} {200:>6} {cnt:>12} {dt:>9.2f}")


if __name__ == "__main__":
    main()
