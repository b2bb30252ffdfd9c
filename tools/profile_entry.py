"""Per-entry Spark job profile: run one catalog entry with the UI
enabled and dump every job's wall time, stage count and task count from
the REST API — the guide-§1 'where does the wall go' measurement for
entries whose cost is many small driver-sequenced jobs rather than one
big plan (the persistent-index scenario family).

Usage:
    python tools/profile_entry.py <entry> [<entry> ...] [--sf-dir DIR]

Prints per entry: total wall, job count, sum of job walls, and the top
jobs by duration with their descriptions (label your phases with
setJobDescription to make these readable).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def fetch(url: str):
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    from iheardai_data_pipeline_spark.plans.catalog import (
        CATALOG,
        _ensure_loaded,
    )
    from iheardai_data_pipeline_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark(
        app_name="profile-entry",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    # warm like bench.py
    spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet")).count()
    base = "http://localhost:4050/api/v1"
    app_id = fetch(f"{base}/applications")[0]["id"]

    for name in args.entries:
        spec = CATALOG[name]
        for run in range(args.runs):
            before_jobs = {j["jobId"] for j in fetch(f"{base}/applications/{app_id}/jobs")}
            t0 = time.perf_counter()
            df = spec.fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            spark.catalog.clearCache()
            jobs = [
                j
                for j in fetch(f"{base}/applications/{app_id}/jobs")
                if j["jobId"] not in before_jobs
            ]
            total_job_ms = 0
            rows = []
            for j in jobs:
                st = j.get("submissionTime")
                ct = j.get("completionTime")
                dur = 0.0
                if st and ct:
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    dur = (
                        datetime.strptime(ct, fmt) - datetime.strptime(st, fmt)
                    ).total_seconds()
                total_job_ms += dur
                rows.append(
                    (
                        dur,
                        j["jobId"],
                        j.get("numTasks", 0),
                        (j.get("description") or j.get("name") or "")[:110],
                    )
                )
            rows.sort(reverse=True)
            print(
                f"\n=== {name} run {run}: wall {wall:.2f}s, {len(jobs)} jobs, "
                f"sum(job walls) {total_job_ms:.2f}s, "
                f"gap (driver/planning) {wall - total_job_ms:.2f}s"
            )
            for dur, jid, ntasks, desc in rows[:25]:
                print(f"  {dur:6.3f}s  job {jid:4d}  {ntasks:4d} tasks  {desc}")


if __name__ == "__main__":
    main()
