"""Machine-readable sf1 evidence ledger (VERDICT r8 item 5).

sf1 status used to live in SCALE.md prose with two exclusion classes;
this script RUNS the sf1 gate (Spark vs DuckDB on the 10x replica at
spark-warehouse/sf1) for every registered query and writes
SF1_LEDGER.json mapping each name to one of:

  hash-exact            full oracle gate passed at sf1
  engine-only-timed     engine ran at sf1; oracle excluded (curated
                        disk-exhausting class), interrupted on timeout
                        (super-linear class, caught operationally), or
                        rows-only by design — reason recorded
  fail                  gate mismatch at sf1 (a real finding)
  error                 engine-side error at sf1
  not-run               placeholder until a run covers it

The ledger is written after EVERY query (crash-safe, resumable) and is
diffable: coverage drift shows up in version control, not archaeology.

Usage:
  SPARK_DRIVER_MEMORY=48g python scripts/sf1_ledger.py            # fill all missing
  SPARK_DRIVER_MEMORY=48g python scripts/sf1_ledger.py name ...   # (re-)run subset
  python scripts/sf1_ledger.py --summary                          # counts only

Verify coverage with one jq line:
  jq '[.[] | .status] | group_by(.) | map({(.[0]): length}) | add' SF1_LEDGER.json
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

SF1_DIR = os.path.join(REPO, "spark-warehouse", "sf1")
LEDGER = os.path.join(REPO, "SF1_LEDGER.json")
ORACLE_TIMEOUT_S = int(os.environ.get("SF1_ORACLE_TIMEOUT_S", "300"))

# Oracles that must not even START at sf1 (they exhaust DuckDB's disk
# spill budget, not just time — the r5 exclusion class): the unrolled
# pagerank-CTE family replays 5+ full-edge-set rounds as nested CTEs
# over ~12M edges. Everything merely super-linear (exact pair-join
# oracles) is caught operationally by the interrupt timeout instead.
EXCLUDED_ORACLES = {
    "graph_pagerank": "unrolled pagerank-CTE oracle exhausts DuckDB spill at sf1",
    "graph_pagerank_shuffle": "unrolled pagerank-CTE oracle exhausts DuckDB spill at sf1",
    "graph_ppr": "unrolled pagerank-CTE oracle exhausts DuckDB spill at sf1",
}


def _load_check_entry():
    spec = importlib.util.spec_from_file_location(
        "check_entry", os.path.join(REPO, "scripts", "check_entry.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_ledger() -> dict:
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            return json.load(f)
    return {}


def save_ledger(ledger: dict) -> None:
    tmp = LEDGER + ".tmp"
    with open(tmp, "w") as f:
        json.dump(dict(sorted(ledger.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    os.replace(tmp, LEDGER)


def run_oracle_with_timeout(con, sql: str):
    """(cols, rows) or raises; interrupts DuckDB after ORACLE_TIMEOUT_S."""
    timer = threading.Timer(ORACLE_TIMEOUT_S, con.interrupt)
    timer.start()
    try:
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        return cols, res.fetchall()
    finally:
        timer.cancel()


def gate_one(name, fn, oracles, spark, con, norm) -> dict:
    t0 = time.time()
    try:
        df = fn(spark, SF1_DIR)
        rows = df.collect()
        cols = df.columns
    except Exception as e:  # noqa: BLE001 - ledger records, never aborts
        return {
            "status": "error",
            "reason": f"engine {type(e).__name__}: {str(e)[:200]}",
            "sec": round(time.time() - t0, 1),
        }
    engine_sec = round(time.time() - t0, 1)
    base = {"sec": engine_sec, "rows": len(rows)}
    if name in EXCLUDED_ORACLES:
        return {
            "status": "engine-only-timed",
            "reason": f"excluded: {EXCLUDED_ORACLES[name]}",
            **base,
        }
    if name not in oracles:
        return {
            "status": "engine-only-timed",
            "reason": "no_oracle (rows-only by design)",
            **base,
        }
    try:
        dcols, drows = run_oracle_with_timeout(con, oracles[name])
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        if "INTERRUPT" in msg.upper() or "interrupted" in msg.lower():
            return {
                "status": "engine-only-timed",
                "reason": f"oracle_timeout>{ORACLE_TIMEOUT_S}s (super-linear oracle at sf1)",
                **base,
            }
        return {
            "status": "engine-only-timed",
            "reason": f"oracle_error: {msg[:200]}",
            **base,
        }
    if sorted(cols) != sorted(dcols):
        return {"status": "fail", "reason": "schema mismatch", **base}
    so = sorted(range(len(cols)), key=lambda i: cols[i])
    do = sorted(range(len(dcols)), key=lambda i: dcols[i])
    sset = sorted((tuple(norm(r[i]) for i in so) for r in rows), key=repr)
    dset = sorted((tuple(norm(r[i]) for i in do) for r in drows), key=repr)
    if len(sset) != len(dset):
        return {
            "status": "fail",
            "reason": f"rows spark={len(sset)} duck={len(dset)}",
            **base,
        }
    if sset != dset:
        i = next(i for i, (a, b) in enumerate(zip(sset, dset)) if a != b)
        return {
            "status": "fail",
            "reason": f"value mismatch at sorted row {i}",
            **base,
        }
    return {"status": "hash-exact", **base}


def main() -> None:
    args = [a for a in sys.argv[1:]]
    ledger = load_ledger()

    import __spark_entry__ as entrymod

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF1_DIR
    qs = entrymod.queries()

    if "--summary" in args:
        counts: dict[str, int] = {}
        for name in qs:
            st = ledger.get(name, {}).get("status", "not-run")
            counts[st] = counts.get(st, 0) + 1
        stale = [k for k in ledger if k not in qs]
        print(json.dumps(counts, indent=1, sort_keys=True))
        if stale:
            print(f"stale ledger keys (not in registry): {stale}")
        return

    only = set(args)
    todo = [
        n
        for n in qs
        if (n in only)
        or (not only and ledger.get(n, {}).get("status", "not-run") == "not-run")
    ]
    # registry names always present, placeholder until run
    for n in qs:
        ledger.setdefault(n, {"status": "not-run"})
    for stale in [k for k in ledger if k not in qs]:
        del ledger[stale]
    save_ledger(ledger)
    if not todo:
        print("nothing to run (use --summary or name a query)")
        return

    import duckdb

    from project_cortex_spark.session import get_spark
    from project_cortex_spark.sources.registry import DEFAULT_TABLES

    ce = _load_check_entry()
    spark = get_spark(app_name="sf1-ledger")
    con = duckdb.connect()
    # bound the oracle side: without a cap DuckDB happily allocates the
    # host's entire RAM on a super-linear plan BEFORE the interrupt
    # timer can matter (observed: the sf1 ppjoin oracle OOM-killed the
    # whole process at 75 GB RSS). With a cap it spills or raises an
    # OOM error, which gate_one records as engine-only-timed.
    con.execute("SET memory_limit='16GB'")
    con.execute("SET temp_directory='/tmp/duckdb_sf1_spill'")
    con.execute("SET max_temp_directory_size='40GB'")
    for t in DEFAULT_TABLES:
        p = os.path.join(SF1_DIR, f"{t}.parquet")
        if os.path.isdir(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            )
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = entrymod.oracle_sql()

    for i, name in enumerate(todo):
        rec = gate_one(name, qs[name], oracles, spark, con, ce.norm)
        # merge with the on-disk state at every write: a concurrent
        # run (e.g. a targeted re-gate while a full sweep grinds) must
        # not be clobbered by this process's stale in-memory copy
        ledger = load_ledger()
        for n in qs:
            ledger.setdefault(n, {"status": "not-run"})
        ledger[name] = rec
        save_ledger(ledger)
        print(
            f"[{i + 1}/{len(todo)}] {name}: {rec['status']}"
            + (f" ({rec.get('reason')})" if rec.get("reason") else "")
            + f" {rec.get('sec', '?')}s"
        )
    counts: dict[str, int] = {}
    for name in qs:
        st = ledger.get(name, {}).get("status", "not-run")
        counts[st] = counts.get(st, 0) + 1
    print(json.dumps(counts, sort_keys=True))


if __name__ == "__main__":
    main()
