"""Streaming window operators (T3-T5).

T3 tumbling usage windows == the batch A8 query under readStream.
T4 session windows: Spark's session_window(ts, gap) merges events whose
gaps are < gap — the exact event-time upgrade of the reference's Redis
1h-TTL session state (enhanced_kpi_consumer.py:638-673, T4). With the
same gap the result row-set equals the batch gap-sessionization (A1),
which is what makes it oracle-checkable.
T5: watermark + dropDuplicates on the event id — the event-time upgrade
of the reference's processing-time seq guard (T5, documented deviation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_usage(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    duration: str = "60 seconds",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T3: per-key tumbling usage windows (billing semantics,
    config/config.yaml:208-212)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_seconds(F.col("w.start")).alias("bucket_start_s"),
            F.col(key_col),
            "n_events",
            "sum_value",
        )
    )


def session_windows(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap: str = "30 minutes",
) -> DataFrame:
    """T4: per-key session windows with inactivity gap.

    Produces the same sessions as the batch gap-sessionizer (A1) for the
    same gap: session start == min(ts), n_events == per-session count.
    """
    return (
        stream.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col(key_col),
            F.unix_seconds(F.col("w.start")).alias("started_at_s"),
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(
    stream: DataFrame,
    id_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T5/M5: event-id dedup bounded by a watermark (state is evicted once
    the watermark passes — bounded memory at any scale)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates([*id_cols])


def stream_stream_attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream INNER join: purchases attributed to a preceding
    click by the same key within ``horizon``.

    The fully-streaming restatement of the as-of/attribution pattern:
    both sides are unbounded, so Spark buffers each in the state store
    and the explicit event-time bound (p.ts BETWEEN c.ts AND c.ts +
    horizon) plus both watermarks let it EVICT state older than
    watermark + horizon — without the time bound the join would be
    rejected (unbounded state). State size tracks the horizon's worth
    of events per key, not stream length.

    Output: one row per (click, purchase) pair within the horizon.
    """
    c = clicks.withWatermark(ts_col, watermark).select(
        F.col(key_col).alias("c_user"),
        F.col(ts_col).alias("ts_click"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark(ts_col, watermark).select(
        F.col(key_col).alias("p_user"),
        F.col(ts_col).alias("ts_purchase"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("ts_purchase") >= F.col("ts_click"))
        & (F.col("ts_purchase") <= F.col("ts_click") + F.expr(f"INTERVAL {horizon}"))
    )
    return c.join(p, cond, "inner").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.unix_seconds("ts_click").alias("click_ts_s"),
        F.unix_seconds("ts_purchase").alias("purchase_ts_s"),
        F.round(F.col("purchase_value").cast("decimal(18,2)"), 2)
        .cast("double")
        .alias("purchase_value"),
    )


def sliding_usage(
    stream: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    duration: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T10 (extension): per-key SLIDING windows — each event lands in
    duration/slide overlapping windows (2 here), the moving-average
    shape tumbling windows can't express. State is bounded by
    watermark + window end exactly as for tumbling; the only cost
    delta is the x(duration/slide) row fan-out into the window
    aggregate, which partial-aggs before the shuffle."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), duration, slide).alias("w"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_seconds(F.col("w.start")).alias("win_start_s"),
            F.col(key_col),
            "n_events",
            "sum_value",
        )
    )
