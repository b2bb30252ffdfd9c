"""Phase-labelled job profile for the postings-index mutation scenario
(guide §1.5: label your jobs). Runs the x_text_bm25_indexed workflow
with setJobDescription around each phase and reports per-phase wall,
job count and task count from the REST API.

Usage: python tools/profile_bm25_phases.py [--sf-dir DIR] [--prune]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def fetch(url: str):
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--prune", action="store_true")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from iheardai_data_pipeline_spark.operators.postings_index import (
        PostingsIndex,
    )
    from iheardai_data_pipeline_spark.plans.extension_queries import (
        _BM25_B,
        _BM25_K1,
        _bm25_query_frame,
        _bm25_scenario_frames,
    )
    from iheardai_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="profile-bm25-phases",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4051"},
    )
    spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet")).count()
    base = "http://localhost:4051/api/v1"
    app_id = fetch(f"{base}/applications")[0]["id"]
    sc = spark.sparkContext

    def jobs_now():
        return {
            j["jobId"]: j for j in fetch(f"{base}/applications/{app_id}/jobs")
        }

    boot, upsert, dele = _bm25_scenario_frames(spark, args.sf_dir)
    queries = _bm25_query_frame(spark)

    for rep in range(args.repeats):
        root = tempfile.mkdtemp(prefix="bm25prof_", dir="/dev/shm")
        phases = []
        try:
            idx = PostingsIndex(spark, root, k1=_BM25_K1, b=_BM25_B)
            work = [
                ("boot-append", lambda: idx.append(boot, seq=0, epoch="boot")),
                ("replay-append", lambda: idx.append(boot, seq=0, epoch="boot")),
                ("upsert-append", lambda: idx.append(upsert, seq=1, epoch="up")),
                ("delete", lambda: idx.delete(dele, seq=2, epoch="del")),
                (
                    "serve",
                    lambda: idx.topk(
                        queries, k=5, prune=args.prune
                    ).localCheckpoint(eager=True),
                ),
            ]
            for label, fn in work:
                before = set(jobs_now())
                sc.setJobDescription(label)
                t0 = time.perf_counter()
                fn()
                wall = time.perf_counter() - t0
                sc.setJobDescription(None)
                after = jobs_now()
                new = [after[j] for j in after if j not in before]
                phases.append(
                    (
                        label,
                        wall,
                        len(new),
                        sum(j.get("numTasks", 0) for j in new),
                    )
                )
        finally:
            shutil.rmtree(root, ignore_errors=True)
        print(f"\n--- repeat {rep} ---")
        tot = 0.0
        for label, wall, njobs, ntasks in phases:
            tot += wall
            print(
                f"  {label:15s} {wall:6.2f}s  {njobs:3d} jobs  {ntasks:5d} tasks"
            )
        print(f"  {'TOTAL':15s} {tot:6.2f}s")


if __name__ == "__main__":
    main()
