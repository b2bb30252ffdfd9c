"""Capture .explain("formatted") for catalog entries into plans/r<N>/.

Usage:
    python tools/capture_plans.py before|after <entry> [<entry> ...]
        [--sf-dir DIR] [--serve-plans] [--round N] [--out-repo DIR]

For eager (scenario) entries the returned frame is a checkpoint tail;
--serve-plans additionally captures the MEANINGFUL inner serve plan for
the postings-index entries (the plan the serve actually executes,
explained BEFORE the eager checkpoint materializes it).
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def fmt_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag", choices=["before", "after"])
    ap.add_argument("entries", nargs="*")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--serve-plans", action="store_true")
    ap.add_argument("--round", type=int, default=15)
    ap.add_argument(
        "--out-repo",
        default=REPO,
        help="repo root to write plans/ under (so a BEFORE-tree worktree "
        "can emit into the main repo's plans dir)",
    )
    args = ap.parse_args()

    from iheardai_data_pipeline_spark.plans.catalog import (
        CATALOG,
        _ensure_loaded,
    )
    from iheardai_data_pipeline_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark(app_name="capture-plans")
    out_dir = os.path.join(args.out_repo, "plans", f"r{args.round}")
    os.makedirs(out_dir, exist_ok=True)

    for name in args.entries:
        df = CATALOG[name].fn(spark, args.sf_dir)
        path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted'), {args.tag}, "
                     f"sf_dir={args.sf_dir}\n")
            fh.write(fmt_plan(df))
        print("wrote", path)

    if args.serve_plans:
        # the postings scenario's inner serve plan, pre-checkpoint
        import shutil
        import tempfile

        from iheardai_data_pipeline_spark.operators.postings_index import (
            PostingsIndex,
        )
        from iheardai_data_pipeline_spark.plans.extension_queries import (
            _BM25_B,
            _BM25_K1,
            _bm25_query_frame,
            _bm25_scenario_frames,
        )

        boot, upsert, dele = _bm25_scenario_frames(spark, args.sf_dir)
        root = tempfile.mkdtemp(prefix="plancap_", dir="/dev/shm")
        try:
            idx = PostingsIndex(spark, root, k1=_BM25_K1, b=_BM25_B)
            idx.append(boot, seq=0, epoch="boot")
            idx.append(upsert, seq=1, epoch="up")
            idx.delete(dele, seq=2, epoch="del")
            q = _bm25_query_frame(spark)
            # the compact postings fold, explained over the live store
            # (the plan x_text_bm25_compact's maintenance half executes)
            live = idx._live_doclens(idx._store.read("doclens")).select(
                idx.id_col, "seq"
            ).localCheckpoint(eager=True)
            fold = idx._compact_fold(live, None)
            compact_fold = fold(
                "postings", idx._store.read("postings"), None
            )
            for label, frame in (
                ("bm25_serve_unpruned", idx.topk(q, k=5)),
                ("bm25_compact_postings_fold", compact_fold),
            ):
                path = os.path.join(out_dir, f"{label}_{args.tag}.txt")
                with open(path, "w") as fh:
                    fh.write(
                        f"# inner {label} plan (pre-checkpoint), "
                        f"{args.tag}, sf_dir={args.sf_dir}\n"
                    )
                    fh.write(fmt_plan(frame))
                print("wrote", path)
        finally:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
