"""Local mirror of the driver's correctness gate: run every queries() entry
at sf0.01 and compare against oracle_sql() in DuckDB (row count + sorted-
by-name columns + order-insensitive values). Usage:

    python scripts/check_entry.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from project_cortex_spark.session import get_spark
from project_cortex_spark.sources.registry import DEFAULT_TABLES


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == 0.0:
            return 0.0  # canonicalize -0.0: == 0.0 but repr-sorts apart
        a = abs(v)
        if a >= 1e6:
            # round(v, 6) is an ABSOLUTE tolerance: at sf1, sums >1e9
            # diverge between engines by ~1 ulp (1.5e-16 relative —
            # reassociation noise, SCALE.md) and 6 dp flags them. Large
            # magnitudes compare at 12 significant digits instead
            # (relative granularity ~1e-12): collapses ulp noise at any
            # scale while staying far below any logic-bug divergence.
            # Small magnitudes keep the exact 6 dp contract the driver
            # gate uses at sf0.01.
            return round(v, 11 - int(math.floor(math.log10(a))))
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # data-derived oracles (inlined k-means centroids) must train on the
    # SAME sf as the engine side; the driver gate's default is sf0.01
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    spark = get_spark(app_name="check-entry")
    con = duckdb.connect()
    for t in DEFAULT_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # directory-layout table (e.g. the sf1 harness): glob parts
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            )
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    # smoke the flagship
    if not only:
        t0 = time.time()
        res = entrymod.entry(spark)
        n = res.count()
        print(f"entry(): {n} rows in {time.time()-t0:.1f}s  schema={res.columns}")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            rows = df.collect()
            cols = df.columns
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak {name}: {len(rows)} rows (no oracle) {time.time()-t0:.1f}s")
            n_weak += 1
            continue
        try:
            dres = con.execute(oracles[name])
            dcols = [d[0] for d in dres.description]
            drows = dres.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            n_fail += 1
            continue
        if sorted(cols) != sorted(dcols):
            print(f"FAIL {name}: cols spark={sorted(cols)} duck={sorted(dcols)}")
            n_fail += 1
            continue
        so = sorted(range(len(cols)), key=lambda i: cols[i])
        do = sorted(range(len(dcols)), key=lambda i: dcols[i])
        sset = sorted((tuple(norm(r[i]) for i in so) for r in rows), key=repr)
        dset = sorted((tuple(norm(r[i]) for i in do) for r in drows), key=repr)
        if len(sset) != len(dset):
            print(f"FAIL {name}: rows spark={len(sset)} duck={len(dset)}")
            n_fail += 1
        elif sset != dset:
            diff = [i for i, (a, b) in enumerate(zip(sset, dset)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at {diff}")
            for i in diff[:2]:
                print(f"   spark={sset[i]}\n   duck ={dset[i]}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sset)} rows {time.time()-t0:.1f}s")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
