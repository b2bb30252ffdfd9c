"""SparkSession builder tuned for the engine.

Local mode is the test bed; the config block is written for a real
multi-executor cluster too (AQE, skew-join handling, partition-size
targets survive a 1000-executor deployment unchanged — only
``shuffle.partitions`` wants raising alongside total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def parallel_legs(*thunks):
    """Run independent driver-sequenced work legs (index builds, shard
    bootstraps, gate recomputations) on a small thread pool so one
    leg's jobs back-fill executors the other leg's driver barriers
    leave idle (guide §2.6: actions are only sequential because the
    driver calls them sequentially). Returns results in thunk order;
    the first exception re-raises.

    Use ONLY for legs with no data dependency and disjoint store
    paths — the scheduler (FIFO) interleaves their jobs on one
    SparkSession, which is exactly the supported multi-threaded-driver
    pattern. Legs must also NOT mutate shared session state
    (``spark.conf.set`` / ``setLocalProperty`` / anything with a
    save-restore pattern, e.g. streaming ingest via sinks.py's
    shuffle-partitions override): the pool shares one SparkSession, so
    a concurrent save/restore races and can corrupt the restored value
    for the whole session (ADVICE r14). At 100 TB the same overlap
    hides each leg's commit/probe barriers behind the other leg's scan
    compute."""
    from concurrent.futures import ThreadPoolExecutor

    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]


def get_spark(
    app_name: str = "iheardai_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Settings rationale, scale-first:

    - AQE on: runtime coalescing of post-shuffle partitions + skew-join
      splitting replaces hand-tuned partition counts at 100 TB.
    - ``autoBroadcastJoinThreshold`` left at default (10 MB): dims like
      nation/region/date rollups broadcast automatically; big-big joins
      stay sort-merge.
    - UTC session TZ: the DuckDB oracle compares timestamp values; DuckDB
      is UTC-naive, so Spark must not apply a local zone.
    - Arrow on: every Pandas-UDF boundary (the few we allow) is batched.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    n_shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # runtime row-level filtering: inject a bloom filter built from a
        # selective join side into the other side's scan — at 100 TB this
        # prunes shuffle input for the q3/q5/q10-style selective-dim joins
        # where static partition pruning can't apply
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
