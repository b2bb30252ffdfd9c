"""Run any catalog query from the command line.

Usage:
    python tools/run_query.py <query_name> [--sf-dir DIR] [--show N]
                              [--explain] [--oracle] [--list]

--list prints every registered query with its tags and doc line.
--oracle also runs the DuckDB oracle and reports the comparison
(requires the query to have one) — the same check the driver applies.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name", nargs="?", help="catalog query name")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--show", type=int, default=20, help="rows to display")
    ap.add_argument("--explain", action="store_true", help="print the formatted plan")
    ap.add_argument("--oracle", action="store_true", help="compare against DuckDB")
    ap.add_argument("--list", action="store_true", help="list all queries")
    args = ap.parse_args()

    from iheardai_data_pipeline_spark.plans.catalog import CATALOG, _ensure_loaded

    _ensure_loaded()
    if args.list or not args.name:
        for name, spec in sorted(CATALOG.items()):
            doc = (spec.doc or "").split(". ")[0][:88]
            oracle = "oracle" if spec.oracle else "rows-only"
            print(f"{name:34s} [{oracle}] {','.join(spec.tags)}\n    {doc}")
        return
    if args.name not in CATALOG:
        sys.exit(f"unknown query {args.name!r} — try --list")

    from iheardai_data_pipeline_spark.session import get_spark

    spec = CATALOG[args.name]
    spark = get_spark(app_name=f"run-{args.name}")
    t0 = time.time()
    df = spec.fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    n = df.count()
    print(f"{args.name}: {n} rows in {time.time() - t0:.2f}s at {args.sf_dir}")
    df.show(args.show, truncate=False)
    if args.oracle:
        if spec.oracle is None:
            print("no oracle for this query (rows-only by design)")
        else:
            sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
            from oracle_harness import compare, run_oracle

            problems = compare(df, run_oracle(spec.oracle, args.sf_dir))
            print("ORACLE:", "MATCH" if not problems else problems)
    spark.stop()


if __name__ == "__main__":
    main()
