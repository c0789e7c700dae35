"""Time individual queries() entries in isolation with the noop sink
(guide §1.4): warm-up run + min-of-N timed runs, job-labelled.

Usage: python scripts/time_query.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), TIME_RUNS (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from project_cortex_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("TIME_RUNS", "3"))
    spark = get_spark(app_name="time-query")
    qs = entrymod.queries()
    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for i in range(n_runs):
            spark.sparkContext.setJobDescription(f"timed[{i}]: {name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        out[name] = {
            "min": round(min(samples), 3),
            "samples": [round(s, 3) for s in samples],
        }
        print(f"{name}: {out[name]}", flush=True)
    print(json.dumps({k: v["min"] for k, v in out.items()}))


if __name__ == "__main__":
    main()
