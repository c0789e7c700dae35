"""Branch retention/eviction operator vs a literal sequential-walk
reference (internal/cache/eviction.go:48-135 semantics)."""

from __future__ import annotations

from project_cortex_spark.operators.retention import evict_stale_branches

DAY_US = 86_400 * 1_000_000
NOW = 1_000 * DAY_US


def _walk_reference(meta, live, *, max_age_days, max_size_mb, protect):
    """The reference's literal loop: sort (deleted first, oldest first),
    evict on deleted/stale/over-cap with a DECREMENTING running total."""
    total = sum(m["size_mb"] for m in meta)
    cands = [m for m in meta if m["branch"] not in protect]
    for m in cands:
        m["deleted"] = live is not None and m["branch"] not in live
        m["stale"] = (
            max_age_days > 0
            and NOW - m["last_accessed_us"] > max_age_days * DAY_US
        )
    cands.sort(key=lambda m: (not m["deleted"], m["last_accessed_us"], m["branch"]))
    out = []
    for m in cands:
        evict = m["deleted"] or m["stale"] or (
            max_size_mb > 0 and total > max_size_mb
        )
        if evict:
            reason = ("deleted" if m["deleted"]
                      else "stale" if m["stale"] else "size")
            out.append((m["branch"], reason))
            total -= m["size_mb"]
    return sorted(out)


def _mk_meta(rows):
    return [
        {"branch": b, "last_accessed_us": ts, "size_mb": float(mb)}
        for b, ts, mb in rows
    ]


def _spark_result(spark, meta, live, **kw):
    df = spark.createDataFrame(
        [(m["branch"], m["last_accessed_us"], m["size_mb"]) for m in meta],
        "branch string, last_accessed_us long, size_mb double",
    )
    got = evict_stale_branches(df, live_branches=live, now_us=NOW, **kw)
    return sorted((r["branch"], r["reason"]) for r in got.collect())


def test_deleted_stale_and_size_rules(spark):
    meta = _mk_meta([
        ("main", NOW - 1 * DAY_US, 100),
        ("feature-old", NOW - 60 * DAY_US, 50),   # stale
        ("feature-gone", NOW - 5 * DAY_US, 40),   # deleted in git
        ("feature-big1", NOW - 10 * DAY_US, 200),
        ("feature-big2", NOW - 9 * DAY_US, 200),
        ("feature-new", NOW - 2 * DAY_US, 30),
    ])
    live = ["main", "feature-old", "feature-big1", "feature-big2", "feature-new"]
    kw = dict(max_age_days=30, max_size_mb=400.0, protect=("main", "master"))
    want = _walk_reference([dict(m) for m in meta], live, **kw)
    got = _spark_result(spark, meta, live, **kw)
    assert got == want
    reasons = dict(got)
    assert reasons["feature-gone"] == "deleted"
    assert reasons["feature-old"] == "stale"
    assert "feature-big1" in reasons  # LRU size eviction


def test_protected_branches_never_evict(spark):
    meta = _mk_meta([("main", NOW - 500 * DAY_US, 900),
                     ("master", NOW - 500 * DAY_US, 900)])
    got = _spark_result(spark, meta, [], max_age_days=1, max_size_mb=1.0)
    assert got == []


def test_size_rule_stops_at_cap(spark):
    # total 260, cap 100: evict oldest until <= 100 (b1+b2), keep b3
    meta = _mk_meta([
        ("b1", NOW - 3 * DAY_US, 80),
        ("b2", NOW - 2 * DAY_US, 90),
        ("b3", NOW - 1 * DAY_US, 90),
    ])
    got = _spark_result(spark, meta, ["b1", "b2", "b3"],
                        max_age_days=0, max_size_mb=100.0)
    assert got == [("b1", "size"), ("b2", "size")]


def test_fuzz_against_reference_walk(spark):
    import random

    rng = random.Random(11)
    for trial in range(8):
        n = rng.randint(1, 12)
        meta = _mk_meta([
            (f"b{i}", NOW - rng.randint(0, 90) * DAY_US, rng.randint(1, 300))
            for i in range(n)
        ])
        live = [m["branch"] for m in meta if rng.random() > 0.3]
        kw = dict(
            max_age_days=rng.choice([0, 15, 45]),
            max_size_mb=float(rng.choice([0, 150, 600])),
            protect=("b0",),
        )
        want = _walk_reference([dict(m) for m in meta], live, **kw)
        got = _spark_result(spark, meta, live, **kw)
        assert got == want, (trial, kw, meta)
