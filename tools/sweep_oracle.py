"""Full-catalog DuckDB value sweep at an arbitrary scale factor.

The per-round driver gate runs at sf0.01 — which cannot see value
classes that only exist on wide domains (the round-5 curve-key int64
overflow surfaced only on xxhash64-valued columns at sf0.1). This tool
runs EVERY catalog entry through the same oracle harness the tests use,
at whichever SF you point it at, and prints one line per query plus a
final tally. Round policy (VERDICT r5 item 5): run at sf0.1 once per
round and record the table in docs/ROUND<N>.md.

    python tools/sweep_oracle.py [/root/testdata/sf0.1] [name-substring]
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tests"))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2] if len(sys.argv) > 2 else ""

    from pyspark.sql import SparkSession

    from oracle_harness import check_query
    from iheardai_data_pipeline_spark.plans.catalog import CATALOG, _ensure_loaded

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        # the sweep drives 216 entries through ONE long-lived JVM; on
        # the 1g default heap the round-14 in-gauntlet run died of GC
        # thrash at entry 128 (OOM -> stopped SparkContext -> 89
        # cascade FAILs). Correctness harness only — bench.py keeps its
        # own session config.
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    _ensure_loaded()
    names = [n for n in sorted(CATALOG) if only in n]
    failed: list[str] = []
    t_all = time.time()
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            errs = check_query(spark, name, sf_dir)
        except Exception as e:  # noqa: BLE001 — sweep must report, not die
            errs = [f"EXCEPTION: {e}"]
        status = "OK" if not errs else "FAIL"
        kind = "value" if CATALOG[name].oracle else "rows-only"
        print(
            f"[{i:3d}/{len(names)}] {name:40s} {status:4s} "
            f"({kind}, {time.time() - t0:.1f}s)",
            flush=True,
        )
        if errs:
            failed.append(name)
            for e in errs[:3]:
                print(f"        {e}", flush=True)
    print(
        f"\n{len(names) - len(failed)}/{len(names)} green at {sf_dir} "
        f"in {time.time() - t_all:.0f}s"
    )
    if failed:
        print("FAILED:", ", ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
