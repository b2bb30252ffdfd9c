"""Physical-plan audit over the query catalog.

For every (or a selected) catalog query, prints the plan facts the
100 TB posture depends on — exchange count, broadcast vs sort-merge
joins, pushed filters, whole-stage-codegen span count — as one line per
query, plus a markdown table for docs/SCALE.md.

Usage:
    python tools/plan_audit.py [--sf-dir /root/testdata/sf0.01] [name ...]

Streaming queries (t3-t11) execute a real micro-batch harness on every
plan request, so they are skipped by default; pass --include-streaming
to audit them too.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def audit_one(spark, name: str, fn, sf_dir: str, execute: bool = False) -> dict:
    df = fn(spark, sf_dir)
    plan = _formatted(df)
    codegen = 0
    if execute:
        # codegen spans only materialize on the AQE-final executed plan
        df.collect()
        executed = df._jdf.queryExecution().executedPlan().toString()
        codegen = len(set(re.findall(r"\*\((\d+)\)", executed)))
    return {
        "query": name,
        "exchanges": plan.count(") Exchange"),
        "bhj": plan.count(") BroadcastHashJoin"),
        "smj": plan.count(") SortMergeJoin"),
        "bnlj": plan.count(") BroadcastNestedLoopJoin"),
        "codegen_spans": codegen,
        "pushed_filters": "PushedFilters: [" in plan
        and not re.search(r"PushedFilters: \[\]", plan),
        "has_expand": ") Expand" in plan,
        "python_eval": ("ArrowEvalPython" in plan)
        or ("BatchEvalPython" in plan)
        or ("MapInPandas" in plan)
        or ("FlatMapGroupsInPandas" in plan),
        # the visible plan is only the TAIL of the work: part of the
        # query already executed eagerly inside the entry (store
        # commits, streaming replays, eager localCheckpoints show as
        # ExistingRDD/LocalTableScan leaves). Counting its exchanges as
        # the query's cost would be misleading — flag it instead.
        "eager_exec": ("Scan ExistingRDD" in plan)
        or ("LocalTableScan" in plan),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all batch)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--include-streaming", action="store_true")
    ap.add_argument("--markdown", action="store_true", help="emit a markdown table")
    ap.add_argument(
        "--execute",
        action="store_true",
        help="run each query so AQE finalizes; enables codegen span counts",
    )
    args = ap.parse_args()

    from iheardai_data_pipeline_spark.plans.catalog import CATALOG, _ensure_loaded
    from iheardai_data_pipeline_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark(app_name="plan-audit")
    names = args.names or sorted(CATALOG)
    rows = []
    for name in names:
        if name not in CATALOG:
            print(f"?? unknown query {name}", file=sys.stderr)
            continue
        if "streaming" in CATALOG[name].tags and not args.include_streaming:
            continue
        try:
            rows.append(
                audit_one(spark, name, CATALOG[name].fn, args.sf_dir, args.execute)
            )
        except Exception as e:  # audit keeps going; a broken plan is a finding
            print(f"!! {name}: {type(e).__name__}: {e}", file=sys.stderr)
    if args.markdown:
        print("| query | exchanges | BHJ | SMJ | codegen | pushed | python |")
        print("|---|---|---|---|---|---|---|")
        for r in rows:
            exch = (
                f"{r['exchanges']} (eager*)" if r["eager_exec"]
                else str(r["exchanges"])
            )
            print(
                f"| `{r['query']}` | {exch} | {r['bhj']} | {r['smj']} "
                f"| {r['codegen_spans']} | {'y' if r['pushed_filters'] else '-'} "
                f"| {'y' if r['python_eval'] else '-'} |"
            )
        if any(r["eager_exec"] for r in rows):
            print(
                "\n`eager*` = the visible plan is only the tail: part of "
                "the query executed eagerly inside the entry (store "
                "commits, streaming replays, eager checkpoints), so the "
                "exchange count understates the work — see the entry's "
                "behavior tests and SCALE.md rows instead."
            )
    else:
        for r in rows:
            flags = []
            if r["pushed_filters"]:
                flags.append("pushed")
            if r["has_expand"]:
                flags.append("expand")
            if r["python_eval"]:
                flags.append("python")
            if r["eager_exec"]:
                flags.append("eager*")
            if r["bnlj"]:
                flags.append(f"bnlj={r['bnlj']}")
            print(
                f"{r['query']:32s} exch={r['exchanges']:2d} bhj={r['bhj']} "
                f"smj={r['smj']} codegen={r['codegen_spans']} {' '.join(flags)}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
