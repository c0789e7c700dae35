"""Regenerate the golden VALUES oracles that pin deterministic
extractions over the FROZEN snapshot corpus (pipeline_parse_entities,
graph_pattern_search, graph_package_summary).

Run only after a DELIBERATE re-freeze (scripts/freeze_snapshot_corpus.py)
and paste each printed VALUES block over the corresponding literal in
__spark_entry__.py's oracle_sql().
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from project_cortex_spark.session import get_spark


def main() -> None:
    spark = get_spark(app_name="gen-parse-goldens")
    qs = entrymod.queries()

    rows = qs["pipeline_parse_entities"](spark, "").collect()
    print("-- pipeline_parse_entities VALUES --")
    for r in sorted(
        (r["file_path"], r["kind"], r["n"], r["first_line"], r["last_line"],
         r["sum_params"], r["sum_complexity"]) for r in rows
    ):
        print("          (%r,%r,%d,%d,%d,%d,%d)," % r)

    rows = qs["graph_package_summary"](spark, "").collect()
    print("-- graph_package_summary VALUES --")
    for r in sorted(
        (r["package"], r["kind"], r["n_files"], r["n"], r["sum_params"],
         r["sum_complexity"]) for r in rows
    ):
        print("          (%r,%r,%d,%d,%d,%d)," % r)

    rows = qs["graph_pattern_search"](spark, "").collect()
    print("-- graph_pattern_search rows: %d (see entry oracle for shape) --"
          % len(rows))


if __name__ == "__main__":
    main()
