"""A/B: PPJoin prefix filtering vs the unfiltered shared-shingle join
on an adversarial stop-shingle corpus.

Corpus: each doc = 20 unique words + the SAME 5-stopword tail. The
three shingles inside the tail are shared by every doc (df = n), but
true Jaccard between any two docs is ~3/41 — far below the 0.5
threshold, so the correct answer is EMPTY. The unfiltered exact join
still generates ~3 * C(n,2) candidate rows through the hot shingles
(quadratic wasted work — the regime that forces df caps onto it),
while ppjoin's prefixes hold only each doc's RAREST shingles: the
df=n tail shingles sort last in the global (df, shingle) order and
never enter any prefix, so the candidate stage is empty and the whole
plan stays ~linear.

Note the converse case is NOT winnable by any exact algorithm: if the
shared mass pushes true Jaccard ABOVE the threshold, the answer itself
is all-pairs and verification is inherently quadratic in the output.
Prefix filtering removes the quadratic work exactly when the answer is
small — which is the dedup regime (few true near-dups, heavy shared
boilerplate below threshold).

Usage: python scripts/ab_ppjoin.py   # results recorded in SCALE.md
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from project_cortex_spark.operators import dedup as dd
from project_cortex_spark.session import get_spark


def corpus(spark, n):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.expr(
                    "concat_ws(' ', transform(sequence(1, 20), "
                    "j -> concat('u', id, 'w', j)))"
                ),
                F.lit(" the of and to in"),
            ).alias("text"),
        )
        .repartition(32)
        .localCheckpoint(eager=True)
    )


def run(fn, docs, threshold=0.5):
    t0 = time.time()
    cnt = fn(docs, threshold=threshold).count()
    return cnt, time.time() - t0


def main():
    spark = get_spark(app_name="ab-ppjoin")
    print(f"{'n':>7} {'plan':>10} {'pairs':>12} {'sec':>8}")
    for n in (1000, 2000, 4000):
        cnt, dt = run(dd.ngram_jaccard_pairs, corpus(spark, n))
        print(f"{n:>7} {'plain':>10} {cnt:>12} {dt:>8.1f}", flush=True)
    for n in (1000, 2000, 4000, 10000, 50000):
        cnt, dt = run(dd.ppjoin_pairs, corpus(spark, n))
        print(f"{n:>7} {'ppjoin':>10} {cnt:>12} {dt:>8.1f}", flush=True)


if __name__ == "__main__":
    main()
