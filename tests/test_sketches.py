"""Sketch operators: estimate-quality invariants the oracle gate cannot
express (one-sided CMS error, HLL error bound, monoid merge laws) plus
the DuckDB replays themselves on the tiny SF."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from project_cortex_spark import oracle
from project_cortex_spark.operators import sketches as sk
from tests.conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def events(registry):
    return registry.table("events")


def test_cms_matches_oracle(events, duck):
    assert_matches_oracle(
        sk.cms_heavy_hitters(events), duck, oracle.cms_heavy_hitters_sql()
    )


def test_cms_error_is_one_sided(events):
    rows = sk.cms_heavy_hitters(events, k=50).collect()
    assert rows, "expected heavy hitters"
    # min-over-rows can only OVER-count: collisions add, never subtract
    assert all(r.overestimate >= 0 for r in rows)
    assert all(r.est_n >= r.exact_n for r in rows)


def test_cms_top1_is_true_top1(spark):
    # a key 50x hotter than the noise floor cannot be displaced by
    # collision inflation at depth 4: its estimate >= its exact count
    # and every noise key's estimate <= noise + eps*N (eps = e/width)
    data = [(999,)] * 500 + [(i,) for i in range(200)]
    df = spark.createDataFrame(data, "user_id bigint")
    top = sk.cms_heavy_hitters(df, k=1).collect()[0]
    assert top.user_id == 999
    assert top.exact_n == 500


def test_hll_matches_oracle(events, duck):
    assert_matches_oracle(
        sk.hll_distinct(events), duck, oracle.hll_distinct_sql()
    )


def test_hll_error_within_bound(spark):
    # 1.04/sqrt(256) = 6.5% standard error; assert 3 sigma on a
    # 5k-distinct synthetic set
    df = spark.createDataFrame(
        [("g", i) for i in range(5000)], "event_type string, user_id bigint"
    )
    r = sk.hll_distinct(df).collect()[0]
    assert r.exact_distinct == 5000
    assert r.rel_err < 0.20


def test_hll_registers_merge_as_max(spark):
    # the monoid law behind file/partition/micro-batch mergeability:
    # registers(A union B) == max-merge(registers(A), registers(B)),
    # so the ESTIMATE of the union equals the estimate from merged
    # halves — verified end-to-end by splitting on key parity
    df = spark.createDataFrame(
        [("g", i) for i in range(2000)], "event_type string, user_id bigint"
    )
    whole = sk.hll_distinct(df).collect()[0]
    halves = df.filter("user_id % 2 = 0").unionAll(df.filter("user_id % 2 = 1"))
    merged = sk.hll_distinct(halves).collect()[0]
    assert whole.est_distinct == merged.est_distinct


def test_quantiles_match_oracle(events, duck):
    assert_matches_oracle(
        sk.exact_quantiles(events), duck, oracle.exact_quantiles_sql()
    )


def test_quantiles_are_exact_on_known_data(spark):
    vals = [float(v) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame(
        [("g", v) for v in vals], "event_type string, value double"
    )
    got = {
        r.q: r.value
        for r in sk.exact_quantiles(df, qs=(0.25, 0.5, 0.99)).collect()
    }
    # percentile_disc: value at rank ceil(q*n), 1-indexed
    assert got == {0.25: 25.0, 0.5: 50.0, 0.99: 99.0}


def test_cms_sketch_is_bounded(events):
    # the scale contract: after partial aggregation the sketch carries
    # at most depth*width cells no matter the input size
    key = F.col("user_id")
    pos = [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"cms{r}:"), key.cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % 512
        ).alias(f"p{r}")
        for r in range(4)
    ]
    cells = (
        events.select(F.posexplode(F.array(*pos)).alias("r", "c"))
        .groupBy("r", "c")
        .count()
    )
    assert cells.count() <= 4 * 512


def test_kmv_matches_oracle(events, duck):
    assert_matches_oracle(
        sk.kmv_pair_overlap(events), duck, oracle.kmv_pair_overlap_sql()
    )


def test_kmv_is_exact_when_union_fits_in_sample(events):
    # k larger than any union -> the "sample" is the union itself and
    # the estimate collapses to the exact Jaccard; also the general
    # invariant that the estimate is a valid fraction
    rows = sk.kmv_pair_overlap(events, k=1_000_000).collect()
    assert rows, "expected group pairs"
    for r in rows:
        assert r.est_jaccard == r.exact_jaccard
    small = sk.kmv_pair_overlap(events, k=64).collect()
    assert all(0.0 <= r.est_jaccard <= 1.0 for r in small)


def test_kmv_estimate_near_exact_on_synthetic_overlap(spark):
    # groups A (0..999) and B (500..1499): true Jaccard = 500/1500
    data = [("A", i) for i in range(1000)] + [("B", i) for i in range(500, 1500)]
    df = spark.createDataFrame(data, "event_type string, user_id bigint")
    r = sk.kmv_pair_overlap(df, k=256).collect()[0]
    assert abs(r.exact_jaccard - 1 / 3) < 1e-6
    # KMV standard error ~ sqrt(J(1-J)/k) ~ 0.03; allow 4 sigma
    assert abs(r.est_jaccard - r.exact_jaccard) < 0.12
