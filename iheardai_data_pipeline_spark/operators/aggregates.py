"""Aggregate / window / journey operators (SURVEY.md §2.5-2.8, A2-A9, W1-W2, O-series).

Each function is a pure ``DataFrame -> DataFrame`` restatement of one of
the reference's SQL aggregates, written so Catalyst plans a single-shuffle
(or shuffle-reusing) physical query:

- partial aggregation (map-side combine) is automatic for sum/count/avg;
- countDistinct plans as two-phase expand+agg — fine at these widths;
- the journey-path group-by-array reuses the sessionize shuffle (same key);
- small dimension sides broadcast automatically (10 MB default threshold).

Float discipline (driver hash-compare): every money-ish sum goes through
DECIMAL(18,2) then back to double; every avg/ratio is computed in exact
integer arithmetic (functions.exact) so Spark and the DuckDB oracle round
identically; timestamps surface as epoch seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.functions.exact import avg_money, ratio_half_up


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


def daily_rollup(
    df: DataFrame,
    date_col: str,
    value_col: str,
) -> DataFrame:
    """A2: per-day count + average (reference daily_lead_metrics,
    enhanced_kpi_consumer.py:541-553). Date surfaced as 'yyyy-MM-dd'
    string for hash-stable comparison."""
    d = F.date_format(F.col(date_col), "yyyy-MM-dd").alias("metric_date")
    return (
        df.groupBy(d)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            avg_money(value_col, 4).alias("avg_value"),
        )
        .orderBy("metric_date")
    )


def daily_performance_summary(events: DataFrame, orders: DataFrame) -> DataFrame:
    """A3: daily event rollup LEFT JOIN daily order metrics on the date key
    (reference daily_performance_summary, sql/enhanced_schema.sql:234-251;
    J2's expression-key join).

    The order-side rollup is tiny (one row per day) so Catalyst broadcasts
    it; the event side aggregates with map-side combine first.
    """
    ev = (
        events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("metric_date"))
        .agg(
            F.countDistinct("user_id").alias("active_users"),
            F.count(F.lit(1)).alias("total_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
            avg_money("value", 4).alias("avg_value"),
        )
    )
    od = (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("metric_date"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("order_revenue"),
        )
    )
    return (
        ev.join(F.broadcast(od), "metric_date", "left")
        .orderBy(F.desc("metric_date"))
    )


def realtime_dashboard(events: DataFrame) -> DataFrame:
    """A4: single-row conditional aggregation (reference
    real_time_kpi_dashboard matview, sql/enhanced_schema.sql:254-278).

    Deviation for determinism: the reference buckets relative to NOW();
    we anchor to max(ts) in the data (documented; same plan shape).
    The anchor is computed in the same pass via a window-free max over a
    1-row broadcastable aggregate, then the conditional agg runs in one
    scan: agg(count(when(...)), countDistinct(when(...))).
    """
    anchored = events.crossJoin(
        F.broadcast(events.agg(F.max("ts").alias("anchor")))
    )
    hour_ago = F.col("anchor") - F.expr("INTERVAL 1 HOUR")
    day_ago = F.col("anchor") - F.expr("INTERVAL 24 HOURS")
    return anchored.agg(
        F.countDistinct(F.when(F.col("ts") >= hour_ago, F.col("user_id"))).alias(
            "last_hour_users"
        ),
        F.count(F.when(F.col("ts") >= hour_ago, 1)).alias("last_hour_events"),
        F.sum(F.when(F.col("ts") >= hour_ago, _dec("value"))).cast("double").alias(
            "last_hour_value"
        ),
        F.countDistinct(F.when(F.col("ts") >= day_ago, F.col("user_id"))).alias(
            "last_day_users"
        ),
        F.count(F.when(F.col("ts") >= day_ago, 1)).alias("last_day_events"),
        F.sum(F.when(F.col("ts") >= day_ago, _dec("value"))).cast("double").alias(
            "last_day_value"
        ),
        F.count(F.lit(1)).alias("total_events"),
    )


def journey_paths(
    events: DataFrame,
    user_col: str = "user_id",
    session_col: str = "session_seq",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """A6 + W2: ordered event sequence per session, then group BY the path
    (reference user-journey query, snowflake_loader.py:202-223).

    The ordered collect is array_sort over (ts, tiebreak, type) structs —
    no second shuffle: the groupBy(user, session) reuses sessionize's
    partitioning, and the path-frequency groupBy shuffles only the tiny
    (path, stats) intermediate.
    """
    per_session = (
        events.groupBy(user_col, session_col)
        .agg(
            F.concat_ws(
                "->",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col(ts_col).alias("ts"),
                                F.col(tiebreak_col).alias("tb"),
                                F.col(type_col).alias("et"),
                            )
                        )
                    ),
                    lambda s: s["et"],
                ),
            ).alias("path"),
            F.count(F.lit(1)).alias("n_events"),
            (
                F.max(F.unix_seconds(F.col(ts_col)))
                - F.min(F.unix_seconds(F.col(ts_col)))
            ).alias("duration_s"),
        )
    )
    return (
        per_session.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("frequency"),
            ratio_half_up(F.sum("n_events"), F.count(F.lit(1)), 4).alias("avg_events"),
            ratio_half_up(F.sum("duration_s"), F.count(F.lit(1)), 4).alias("avg_duration_s"),
        )
        .orderBy(F.desc("frequency"), "path")
    )


FUNNEL_STAGES = {"view": 1, "click": 2, "signup": 3, "purchase": 4}


def conversion_funnel(events: DataFrame) -> DataFrame:
    """A7 + W1: event_type -> funnel stage, COUNT(DISTINCT user) per stage,
    LAG over stage order -> stage-to-stage conversion ratio (reference
    funnel query, snowflake_loader.py:225-254).

    The lag window is over the 4-row stage aggregate — a single-partition
    window on purpose (tiny input), not a scale hazard.
    """
    from itertools import chain

    stage_map = F.create_map(
        *chain.from_iterable((F.lit(k), F.lit(v)) for k, v in FUNNEL_STAGES.items())
    )
    staged = events.withColumn("funnel_stage", stage_map[F.col("event_type")]).filter(
        F.col("funnel_stage").isNotNull()
    )
    per_stage = staged.groupBy("funnel_stage").agg(
        F.countDistinct("user_id").alias("users")
    )
    w = Window.orderBy("funnel_stage")
    return (
        per_stage.withColumn("prev_users", F.lag("users").over(w))
        .withColumn(
            "conversion_rate",
            F.when(
                F.col("prev_users").isNotNull(),
                ratio_half_up(F.col("users"), F.col("prev_users"), 4),
            ),
        )
        .orderBy("funnel_stage")
    )


def tumbling_usage_windows(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_duration: str = "60 seconds",
) -> DataFrame:
    """A8/T3: per-key tumbling usage windows (reference billing consumer
    semantics, config/config.yaml:208-212: 60-second buckets per account).

    Spark ``window()`` aligns buckets to the epoch, so bucket_start ==
    floor(ts / 60s) — byte-identical to the oracle's date_trunc.
    """
    return (
        events.groupBy(F.window(F.col(ts_col), window_duration).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec(value_col)).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_seconds(F.col("w.start")).alias("bucket_start_s"),
            F.col(key_col),
            "n_events",
            "sum_value",
        )
        .orderBy("bucket_start_s", key_col)
    )


def top_k(
    df: DataFrame, order_cols: list, k: int
) -> DataFrame:
    """O5: deterministic top-k (order spec must include a unique tiebreak)."""
    return df.orderBy(*order_cols).limit(k)
