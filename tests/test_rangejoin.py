"""Interval join: boundary inclusivity, exactly-once pairs, bucketing."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.operators.rangejoin import interval_join


def _t(second: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(seconds=second)


def test_interval_join_bounds_and_uniqueness(spark):
    left = spark.createDataFrame(
        [(1, _t(100), "L1"), (2, _t(100), "L2")],
        "k bigint, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [
            (1, _t(40), "before"),      # exactly lower bound (100-60)
            (1, _t(39), "too-early"),
            (1, _t(100), "same"),
            (1, _t(160), "after"),      # exactly upper bound
            (1, _t(161), "too-late"),
            (2, _t(120), "other-key"),
        ],
        "k bigint, ts timestamp, tag string",
    )
    out = interval_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        lower_s=-60.0, upper_s=60.0,
    )
    rows = [(r["name"], r["tag_r"]) for r in out.collect()]
    assert sorted(rows) == [
        ("L1", "after"),
        ("L1", "before"),
        ("L1", "same"),
        ("L2", "other-key"),
    ]
    # exactly-once even though left explodes to multiple buckets
    assert len(rows) == len(set(rows))


def test_interval_join_matches_naive_theta_join(spark, sf_dir):
    from iheardai_data_pipeline_spark.sources.batch import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    left = ev.limit(200)
    got = interval_join(
        left, ev, on=["user_id"], left_ts="ts", right_ts="ts",
        lower_s=-300.0, upper_s=300.0, bucket_width_s=120.0,
    ).select("event_id", "event_id_r")
    naive = (
        left.alias("l")
        .join(ev.alias("r"), "user_id")
        .filter(
            (F.col("r.ts") >= F.col("l.ts") - F.expr("INTERVAL 300 SECOND"))
            & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 300 SECOND"))
        )
        .select(F.col("l.event_id").alias("event_id"), F.col("r.event_id").alias("event_id_r"))
    )
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0
