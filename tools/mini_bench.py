"""Subset bench with bench.py's exact methodology (min-of-2, +3rd run
if >2s, noop sink, clearCache+gc between runs) — for A/B measurement of
optimization changes without paying the full 216-entry wall.

Usage: python tools/mini_bench.py <entry> [...] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from iheardai_data_pipeline_spark.plans.catalog import (
        CATALOG,
        _ensure_loaded,
    )
    from iheardai_data_pipeline_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark(app_name="mini-bench")
    spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet")).count()
    spark.range(spark.sparkContext.defaultParallelism).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").count()

    timings = {}
    jvm_gc = spark.sparkContext._jvm.System.gc
    for name in args.entries:
        spec = CATALOG[name]
        best = float("inf")
        runs = 0
        while runs < 2 or (runs < 3 and best > 2.0):
            t0 = time.perf_counter()
            df = spec.fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            runs += 1
            spark.catalog.clearCache()
            jvm_gc()
        timings[name] = round(best, 4)
        print(f"  {best:7.2f}s  {name}", flush=True)
    print(json.dumps({"value": round(sum(timings.values()), 4),
                      "queries": timings}))


if __name__ == "__main__":
    main()
