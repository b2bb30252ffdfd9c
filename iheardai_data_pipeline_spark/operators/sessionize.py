"""Sessionization + per-session KPI rollup (SURVEY.md §2.5 A1, §2.11 T4).

The reference's core product is the per-session KPI row: the consumer
re-aggregates ``session_kpis`` for every touched session on each
micro-batch (reference enhanced_kpi_consumer.py:560-609, target table
sql/enhanced_schema.sql:135-163) and a 1-hour-TTL Redis hash mirrors the
"session is open" notion (enhanced_kpi_consumer.py:638-673).

The reference receives ``session_id`` on its events; the driver's
``events`` table carries only ``user_id``, so this module also provides
the classic gap-based sessionizer (inactivity gap => new session) that
turns the raw event stream into sessions — equivalent to the Redis
1-hour-inactivity TTL semantics, expressed relationally.

Scale posture: one shuffle on ``user_id`` for the window, then the
groupBy reuses that partitioning (Catalyst recognizes the child
distribution), so the whole sessionize+rollup is a single-exchange plan.
Skewed users are handled by AQE skew-join/partition split; there is no
driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.functions.exact import avg_money, sql_avg_money

DEFAULT_GAP_SECONDS = 30 * 60  # reference session TTL analog: config/config.yaml:149


def with_session_id(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Assign a per-user ``session_seq`` by inactivity-gap sessionization.

    A new session starts at the first event of a user and whenever the gap
    to the previous event exceeds ``gap_seconds``. Deterministic: ordering
    is (ts, tiebreak_col).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)
    is_new = F.when(prev_ts.isNull() | (gap_us > gap_seconds * 1_000_000), 1).otherwise(0)
    running = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(tiebreak_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_seq", F.sum(is_new).over(running))


def session_kpis(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    type_col: str = "event_type",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
) -> DataFrame:
    """A1: per-session KPI rollup over a sessionized event stream.

    Mirrors the reference's session_kpis upsert query
    (enhanced_kpi_consumer.py:560-609): COUNT(*), SUMs, AVGs,
    MIN/MAX(timestamp) as started/ended + derived duration.

    Output columns (aliased for the DuckDB oracle):
      user_id, session_seq, n_events, n_event_types, sum_value,
      avg_value, started_at_s, ended_at_s, duration_s
    """
    sess = with_session_id(events, user_col, ts_col, gap_seconds=gap_seconds)
    # Exact decimal sum -> double keeps the oracle hash independent of
    # float summation order; avg derived from the exact sum for the same
    # reason.
    dec_val = F.col(value_col).cast("decimal(18,2)")
    return (
        sess.groupBy(user_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct(F.col(type_col)).alias("n_event_types"),
            F.sum(dec_val).cast("double").alias("sum_value"),
            avg_money(value_col, 4).alias("avg_value"),
            F.min(F.unix_seconds(F.col(ts_col))).alias("started_at_s"),
            F.max(F.unix_seconds(F.col(ts_col))).alias("ended_at_s"),
            (
                F.max(F.unix_seconds(F.col(ts_col))) - F.min(F.unix_seconds(F.col(ts_col)))
            ).alias("duration_s"),
        )
        .orderBy(user_col, "session_seq")
    )


SESSION_KPIS_ORACLE = """
WITH seq AS (
    SELECT
        user_id, event_id, ts, value, event_type,
        CASE
            WHEN LAG(ts) OVER w IS NULL
              OR ts - LAG(ts) OVER w > INTERVAL {gap_seconds} SECOND
            THEN 1 ELSE 0
        END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT *,
        -- CAST: DuckDB's integer window SUM yields HUGEINT, which pandas
        -- materializes as float64; Spark emits int64. The driver hashes
        -- dtypes-as-values, so pin the oracle to BIGINT.
        CAST(SUM(is_new) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS BIGINT) AS session_seq
    FROM seq
)
SELECT
    user_id,
    session_seq,
    COUNT(*) AS n_events,
    COUNT(DISTINCT event_type) AS n_event_types,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
    {avg_sql} AS avg_value,
    CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS started_at_s,
    CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS ended_at_s,
    CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) - CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS duration_s
FROM sess
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
""".format(gap_seconds=DEFAULT_GAP_SECONDS, avg_sql=sql_avg_money("value", 4))
