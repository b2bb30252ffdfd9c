"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {"q": sec}, "sf": ...}

Each query is executed with a NOOP write so the WHOLE plan runs:
``count()`` would let Catalyst eliminate uniquely-keyed left joins and
prune every column, silently under-measuring queries whose real work
feeds an enrichment join (measured 0.3s "count time" vs 6.3s true plan
time on the substring-dedup query). Timings exclude session startup.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from iheardai_data_pipeline_spark.plans.catalog import CATALOG, _ensure_loaded
    from iheardai_data_pipeline_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark(app_name="iheardai-bench")

    # Warm the JVM + parquet footers + the Python worker pool once so
    # per-query numbers measure the queries, not first-touch overhead.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.range(spark.sparkContext.defaultParallelism).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").count()

    # Each query is timed twice and the MIN is reported: run 1 absorbs
    # first-execution JIT/codegen (which amortizes to nothing over a real
    # 100 TB job), run 2 measures the query itself; min-of-N also damps
    # noisy-neighbor variance on a shared box. Build time (DataFrame
    # construction) is inside the timed region both times.
    # Queries still >2s after two runs get a THIRD run: on a shared box
    # those are exactly the timings where noisy-neighbor variance is
    # larger than round-over-round deltas (r4 saw 4.50s driver vs 2.81s
    # local on an identical script), so the slow tail gets one more
    # sample to damp it.
    timings: dict[str, float] = {}
    jvm_gc = spark.sparkContext._jvm.System.gc
    for name, spec in sorted(CATALOG.items()):
        best = float("inf")
        runs = 0
        while runs < 2 or (runs < 3 and best > 2.0):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            runs += 1
            # queries are independent; don't let one query's cached
            # intermediates or garbage raise pressure on the next (heap
            # debt from 40 earlier queries showed up as 2-3x slowdowns
            # in later cache-heavy ones)
            spark.catalog.clearCache()
            jvm_gc()
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    line = json.dumps(
        {
            "metric": "catalog_queries_total_runtime",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "mode": "min_of_2_runs_plus_third_if_over_2s",
        }
    )
    print(line)
    # Persist the full JSON next to the repo as well (round 15): the
    # harness that invokes bench.py keeps only a tail of stdout, which
    # truncated the r13 line and broke that round-over-round comparison.
    # Pure artifact write AFTER all timing — methodology unchanged.
    try:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_LOCAL.json")
        with open(out, "w") as fh:
            fh.write(line + "\n")
    except OSError:
        pass


if __name__ == "__main__":
    main()
