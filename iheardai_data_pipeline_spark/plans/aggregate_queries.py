"""Aggregate / join / window / mutation catalog queries (SURVEY §2.5-2.10).

Role mapping per FIXTURES.md §7: events = the event stream (sessions,
funnels, journeys, windows, dedup); orders/lineitem = fact tables;
customer/nation/region = dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.functions.exact import (
    avg_money,
    int_sum,
    ratio_half_up,
    sql_avg_money,
    sql_int_sum,
    sql_ratio_half_up,
)
from iheardai_data_pipeline_spark.operators import aggregates as agg
from iheardai_data_pipeline_spark.operators import mutations as mut
from iheardai_data_pipeline_spark.operators.sessionize import with_session_id
from iheardai_data_pipeline_spark.plans.catalog import register
from iheardai_data_pipeline_spark.sources.batch import load_table

_SESSION_SQL = """
seq AS (
    SELECT user_id, event_id, ts, value, event_type,
        CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL 1800 SECOND
             THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT *, SUM(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
    FROM seq
)
"""

# --- A2 ---------------------------------------------------------------------

_A2_ORACLE = f"""
SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS metric_date,
    COUNT(*) AS n_rows,
    {sql_avg_money("o_totalprice", 4)} AS avg_value
FROM orders
GROUP BY 1 ORDER BY 1
"""


@register(
    "a2_daily_order_metrics",
    oracle=_A2_ORACLE,
    tags=("aggregate",),
    doc="A2 daily rollup: per-day count + avg (reference daily_lead_metrics, "
    "enhanced_kpi_consumer.py:541-553).",
)
def a2_daily_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.daily_rollup(load_table(spark, sf_dir, "orders"), "o_orderdate", "o_totalprice")


# --- A3 ---------------------------------------------------------------------

_A3_ORACLE = f"""
WITH ev AS (
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS metric_date,
        COUNT(DISTINCT user_id) AS active_users,
        COUNT(*) AS total_events,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        {sql_avg_money("value", 4)} AS avg_value
    FROM events GROUP BY 1
),
od AS (
    SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS metric_date,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS order_revenue
    FROM orders GROUP BY 1
)
SELECT ev.metric_date, ev.active_users, ev.total_events, ev.sum_value, ev.avg_value,
       od.n_orders, od.order_revenue
FROM ev LEFT JOIN od USING (metric_date)
ORDER BY metric_date DESC
"""


@register(
    "a3_daily_performance",
    oracle=_A3_ORACLE,
    tags=("aggregate", "join"),
    doc="A3 daily performance summary + J2 date-key left join (reference "
    "sql/enhanced_schema.sql:234-251).",
)
def a3_daily_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.daily_performance_summary(
        load_table(spark, sf_dir, "events"), load_table(spark, sf_dir, "orders")
    )


# --- A4 ---------------------------------------------------------------------

_A4_ORACLE = """
WITH anchor AS (SELECT MAX(ts) AS a FROM events)
SELECT
    COUNT(DISTINCT CASE WHEN ts >= a - INTERVAL 1 HOUR THEN user_id END) AS last_hour_users,
    COUNT(CASE WHEN ts >= a - INTERVAL 1 HOUR THEN 1 END) AS last_hour_events,
    CAST(SUM(CASE WHEN ts >= a - INTERVAL 1 HOUR THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS last_hour_value,
    COUNT(DISTINCT CASE WHEN ts >= a - INTERVAL 24 HOUR THEN user_id END) AS last_day_users,
    COUNT(CASE WHEN ts >= a - INTERVAL 24 HOUR THEN 1 END) AS last_day_events,
    CAST(SUM(CASE WHEN ts >= a - INTERVAL 24 HOUR THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS last_day_value,
    COUNT(*) AS total_events
FROM events, anchor
"""


@register(
    "a4_realtime_dashboard",
    oracle=_A4_ORACLE,
    tags=("aggregate", "conditional"),
    doc="A4 single-row conditional aggregation dashboard (reference "
    "real_time_kpi_dashboard, sql/enhanced_schema.sql:254-278); anchored "
    "to max(ts) instead of now() for determinism.",
)
def a4_realtime_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.realtime_dashboard(load_table(spark, sf_dir, "events"))


# --- A5 / J1 ------------------------------------------------------------------

_A5_ORACLE = f"""
SELECT c.c_custkey, c.c_mktsegment,
    COUNT(o.o_orderkey) AS n_orders,
    CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
    {sql_ratio_half_up(sql_int_sum("o.o_totalprice"), "COUNT(o.o_orderkey) * 100", 4)}
        AS avg_order_value,
    CAST(FLOOR(epoch(MIN(o.o_orderdate))) AS BIGINT) AS first_order_s,
    CAST(FLOOR(epoch(MAX(o.o_orderdate))) AS BIGINT) AS last_order_s,
    CAST(FLOOR(epoch(MAX(o.o_orderdate))) AS BIGINT)
      - CAST(FLOOR(epoch(MIN(o.o_orderdate))) AS BIGINT) AS span_s
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_mktsegment
ORDER BY c.c_custkey
"""


@register(
    "a5_customer_order_summary",
    oracle=_A5_ORACLE,
    tags=("aggregate", "join"),
    doc="A5 session-summary shape: dimension LEFT JOIN facts + rollup + "
    "epoch-duration arithmetic (reference session_analytics_summary, "
    "sql/enhanced_schema.sql:208-232; J1).",
)
def a5_customer_order_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dec_price = F.col("o_totalprice").cast("decimal(18,2)")
    # o_orderdate is TIMESTAMP_NTZ in the parquet; unix_seconds requires
    # TIMESTAMP — cast is exact under the UTC session TZ
    odate = F.col("o_orderdate").cast("timestamp")
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
    return (
        joined.groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(dec_price).cast("double").alias("revenue"),
            ratio_half_up(
                int_sum("o_totalprice"), F.count("o_orderkey") * 100, 4
            ).alias("avg_order_value"),
            F.min(F.unix_seconds(odate)).alias("first_order_s"),
            F.max(F.unix_seconds(odate)).alias("last_order_s"),
            (F.max(F.unix_seconds(odate)) - F.min(F.unix_seconds(odate))).alias("span_s"),
        )
        .orderBy("c_custkey")
    )


# --- A6 / W2 ------------------------------------------------------------------

_A6_ORACLE = f"""
WITH {_SESSION_SQL},
per_session AS (
    SELECT user_id, session_seq,
        string_agg(event_type, '->' ORDER BY ts, event_id) AS path,
        COUNT(*) AS n_events,
        CAST(FLOOR(epoch(MAX(ts))) AS BIGINT)
          - CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS duration_s
    FROM sess GROUP BY user_id, session_seq
)
SELECT path, COUNT(*) AS frequency,
    {sql_ratio_half_up("SUM(n_events)", "COUNT(*)", 4)} AS avg_events,
    {sql_ratio_half_up("SUM(duration_s)", "COUNT(*)", 4)} AS avg_duration_s
FROM per_session GROUP BY path
ORDER BY frequency DESC, path
"""


@register(
    "a6_journey_paths",
    oracle=_A6_ORACLE,
    tags=("aggregate", "window", "sessionization"),
    doc="A6 user-journey path analysis: ordered event sequence per session, "
    "grouped by path (reference snowflake_loader.py:202-223; W2 ordered "
    "collect).",
)
def a6_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = with_session_id(load_table(spark, sf_dir, "events"))
    return agg.journey_paths(events)


# --- A7 / W1 ------------------------------------------------------------------

_A7_ORACLE = f"""
WITH staged AS (
    SELECT CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                           WHEN 'signup' THEN 3 WHEN 'purchase' THEN 4 END AS funnel_stage,
           user_id
    FROM events
    WHERE event_type IN ('view', 'click', 'signup', 'purchase')
),
per_stage AS (
    SELECT funnel_stage, COUNT(DISTINCT user_id) AS users FROM staged GROUP BY 1
)
SELECT funnel_stage, users,
    LAG(users) OVER (ORDER BY funnel_stage) AS prev_users,
    {sql_ratio_half_up("users", "LAG(users) OVER (ORDER BY funnel_stage)", 4)}
        AS conversion_rate
FROM per_stage ORDER BY funnel_stage
"""


@register(
    "a7_conversion_funnel",
    oracle=_A7_ORACLE,
    tags=("aggregate", "window"),
    doc="A7 conversion funnel with LAG stage-to-stage ratio (reference "
    "snowflake_loader.py:225-254; W1).",
)
def a7_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.conversion_funnel(load_table(spark, sf_dir, "events"))


# --- A8 / T3 ------------------------------------------------------------------

_A8_ORACLE = """
SELECT CAST(FLOOR(epoch(date_trunc('minute', ts))) AS BIGINT) AS bucket_start_s,
    user_id,
    COUNT(*) AS n_events,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register(
    "a8_billing_windows",
    oracle=_A8_ORACLE,
    tags=("aggregate", "streaming-analog"),
    doc="A8/T3 60-second tumbling usage windows per key (reference billing "
    "consumer semantics, config/config.yaml:208-212).",
)
def a8_billing_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.tumbling_usage_windows(load_table(spark, sf_dir, "events"))


# --- M1/M4/W3 -----------------------------------------------------------------

_M1_ORACLE = """
SELECT user_id, event_id, event_type,
    CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s, value
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
ORDER BY user_id
"""


@register(
    "m1_last_write_wins",
    oracle=_M1_ORACLE,
    tags=("mutation", "window"),
    doc="M1/M2/W3 last-writer-wins upsert convention: row_number dedup by "
    "key, newest first (reference ON CONFLICT DO UPDATE, "
    "enhanced_kpi_consumer.py:395-434).",
)
def m1_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        mut.last_write_wins(events, ["user_id"], ["ts", "event_id"])
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_seconds("ts").alias("ts_s"),
            "value",
        )
        .orderBy("user_id")
    )


# --- M3 merge upsert -----------------------------------------------------------

_M3_ORACLE = """
WITH target AS (
    SELECT event_id, user_id, value FROM events WHERE user_id % 2 = 0
),
updates AS (
    SELECT event_id, user_id, value * 2 AS value FROM events WHERE value > 50
)
SELECT event_id, user_id, value FROM updates
UNION ALL
SELECT t.event_id, t.user_id, t.value FROM target t
WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.event_id = t.event_id)
ORDER BY event_id
"""


@register(
    "m3_merge_upsert",
    oracle=_M3_ORACLE,
    tags=("mutation",),
    doc="M3 snapshot+updates merge, update-priority last-writer-wins "
    "(reference aggregate upsert, enhanced_kpi_consumer.py:541-609).",
)
def m3_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    target = events.filter(F.col("user_id") % 2 == 0).select("event_id", "user_id", "value")
    updates = events.filter(F.col("value") > 50).select(
        "event_id", "user_id", (F.col("value") * 2).alias("value")
    )
    return mut.merge_upsert(target, updates, ["event_id"], ["value"]).orderBy("event_id")


# --- M5 event dedup --------------------------------------------------------------

_M5_ORACLE = """
SELECT COUNT(*) AS n_after,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
"""


@register(
    "m5_event_dedup",
    oracle=_M5_ORACLE,
    tags=("mutation",),
    doc="M5 event-id exact dedup: doubling the stream then deduping by "
    "event_id restores the original (reference enable_deduplication, "
    "config/config.yaml:260).",
)
def m5_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    doubled = events.unionByName(events)
    deduped = mut.dedup_by_event_id(doubled)
    return deduped.agg(
        F.count(F.lit(1)).alias("n_after"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


# --- O5 top-k ---------------------------------------------------------------------

_O5_ORACLE = """
SELECT o_custkey,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
    COUNT(*) AS n_orders
FROM orders GROUP BY 1
ORDER BY revenue DESC, o_custkey LIMIT 10
"""


@register(
    "o5_top_customers",
    oracle=_O5_ORACLE,
    tags=("sort", "topk"),
    doc="O5 deterministic top-k ranking (reference lead ranking, "
    "sql/enhanced_schema.sql:177-188).",
)
def o5_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rolled = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return agg.top_k(rolled, [F.desc("revenue"), F.col("o_custkey")], 10)


# --- set ops -----------------------------------------------------------------------

_SETOP_ORACLE = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
EXCEPT
SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
ORDER BY user_id
"""


@register(
    "s_except_users",
    oracle=_SETOP_ORACLE,
    tags=("setop",),
    doc="Set operations (SURVEY §2.9): purchasers EXCEPT error-affected users.",
)
def s_except_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchasers = events.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    erroring = events.filter(F.col("event_type") == "error").select("user_id").distinct()
    return purchasers.exceptAll(erroring).distinct().orderBy("user_id")


# --- J3 declared cross join ---------------------------------------------------------

_J3_ORACLE = """
SELECT e.n_events, o.n_orders
FROM (SELECT COUNT(*) AS n_events FROM events) e
CROSS JOIN (SELECT COUNT(*) AS n_orders FROM orders) o
"""


@register(
    "j3_dashboard_crossjoin",
    oracle=_J3_ORACLE,
    tags=("join",),
    doc="J3: the reference dashboard matview cross-joins two independent "
    "aggregates (sql/enhanced_schema.sql:276-278) — declared semantics "
    "preserved; harmless because both sides are single rows.",
)
def j3_dashboard_crossjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").agg(F.count(F.lit(1)).alias("n_events"))
    od = load_table(spark, sf_dir, "orders").agg(F.count(F.lit(1)).alias("n_orders"))
    return ev.crossJoin(od)


# --- J5 cross-source correlation ------------------------------------------------------

_J5_ORACLE = f"""
WITH cust_rev AS (
    SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
    FROM orders GROUP BY 1
)
SELECT n.n_name AS nation,
    COUNT(*) AS n_customers,
    {sql_avg_money("c.c_acctbal", 4)} AS avg_acctbal,
    CAST(SUM(cr.rev) AS DOUBLE) AS total_revenue
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN cust_rev cr ON cr.o_custkey = c.c_custkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


@register(
    "j5_nation_correlation",
    oracle=_J5_ORACLE,
    tags=("join", "aggregate"),
    doc="J5 cross-source correlation: dim broadcast join + per-key fact "
    "rollup joined and re-aggregated (reference cross-source analytics, "
    "README.md:210).",
)
def j5_nation_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    cust_rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(cust_rev, cust.c_custkey == cust_rev.o_custkey, "left")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            avg_money("c_acctbal", 4).alias("avg_acctbal"),
            F.sum("rev").cast("double").alias("total_revenue"),
        )
        .orderBy("nation")
    )


# --- A4 extension: approximate distinct for the dashboard path ---------------------


# Bounded oracle for the HLL sketch: the raw estimate is engine-specific
# (HLL++ register layout), so it can't be value-compared — but its
# PUBLISHED error bound can. The query emits the exact distinct count
# plus a within-5-sigma flag (|approx - exact| <= 5 * rsd * exact); the
# oracle pins the exact count and TRUE. A broken sketch flips the flag
# and fails the hash compare, so the estimate is now correctness-gated.
# (A production dashboard runs the approx-only projection; the exact
# countDistinct here exists to make the sketch's contract checkable.)
_A4_APPROX_ORACLE = """
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(count(*) AS BIGINT) AS n_events,
       TRUE AS approx_within_5rsd
FROM events
"""


@register(
    "a4_dashboard_approx",
    oracle=_A4_APPROX_ORACLE,
    tags=("aggregate", "approximate", "extension"),
    doc="A4 extension (SURVEY §2.5 note): the real-time dashboard's "
    "COUNT(DISTINCT session) computed with approx_count_distinct — the "
    "sketch the reference can't express but a 100 TB dashboard needs "
    "(bounded memory, one pass, mergeable across executors). The oracle "
    "checks the sketch's published error bound: the query emits a "
    "within-5-sigma flag the exact-count oracle pins to TRUE.",
)
def a4_dashboard_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    rsd = 0.01
    return events.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=rsd)
                - F.countDistinct("user_id")
            )
            <= F.lit(5 * rsd) * F.countDistinct("user_id")
        ).alias("approx_within_5rsd"),
    )


# --- extensions: percentiles + hierarchical rollup ---------------------------------

_PCTL_ORACLE = """
SELECT event_type,
    round(quantile_cont(value, 0.5), 4) AS p50,
    round(quantile_cont(value, 0.95), 4) AS p95,
    round(quantile_cont(value, 0.99), 4) AS p99,
    COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


@register(
    "a_pctl_latency",
    oracle=_PCTL_ORACLE,
    tags=("aggregate", "extension"),
    doc="Exact interpolated percentiles (p50/p95/p99 of value per event "
    "type) — the latency-SLO shape the reference tracks operationally "
    "(README.md:758-761) but can't compute in its Python loop. Spark's "
    "percentile() interpolates identically to DuckDB quantile_cont.",
)
def a_pctl_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


_PCTL_APPROX_ORACLE = """
SELECT event_type,
    quantile_disc(value, 0.5) AS p50,
    quantile_disc(value, 0.95) AS p95,
    quantile_disc(value, 0.99) AS p99,
    COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


@register(
    "a_pctl_approx",
    oracle=_PCTL_APPROX_ORACLE,
    tags=("aggregate", "approximate", "extension"),
    doc="The 100 TB path for the same percentiles: approx_percentile "
    "(mergeable GK sketch, bounded memory, one pass) — exact "
    "percentile() needs the full value set per group; the sketch "
    "doesn't. While a group's row count stays under the sketch "
    "accuracy the GK summary is lossless and returns exactly the "
    "lower-rank element — the same convention as DuckDB quantile_disc "
    "(verified for group sizes 1..60 and the sf0.01 data), so the "
    "oracle is exact at test scale and the operator degrades to "
    "rank-error <= n/accuracy beyond it.",
)
def a_pctl_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # scalar columns, not the raw array: the driver's canonicalizer sorts
    # on every output column and list cells are unhashable there
    pctls = F.expr("approx_percentile(value, array(0.5, 0.95, 0.99), 100000)")
    return (
        events.groupBy("event_type")
        .agg(pctls.alias("pctls"), F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            F.element_at("pctls", 1).alias("p50"),
            F.element_at("pctls", 2).alias("p95"),
            F.element_at("pctls", 3).alias("p99"),
            "n",
        )
        .orderBy("event_type")
    )


_ROLLUP_ORACLE = """
SELECT event_type,
    strftime(ts, '%Y-%m-%d') AS day,
    COUNT(*) AS n_events,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY ROLLUP (event_type, strftime(ts, '%Y-%m-%d'))
ORDER BY event_type NULLS FIRST, day NULLS FIRST
"""


@register(
    "a_rollup_daily",
    oracle=_ROLLUP_ORACLE,
    tags=("aggregate", "extension"),
    doc="Hierarchical ROLLUP (event_type, day) with subtotal and grand-"
    "total rows — grouping-sets surface the reference lacks entirely "
    "(SURVEY §2.5 note); one pass, partial-aggregation eligible.",
)
def a_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.rollup("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy(F.col("event_type").asc_nulls_first(), F.col("day").asc_nulls_first())
    )


# --- ranking windows: rank / dense_rank / ntile ------------------------------------

_RANKING_ORACLE = """
WITH ranked AS (
    SELECT c_custkey, o_orderkey, o_totalprice,
        RANK() OVER w AS price_rank,
        DENSE_RANK() OVER w AS price_dense_rank,
        NTILE(4) OVER w AS spend_quartile
    FROM orders JOIN customer ON o_custkey = c_custkey
    WINDOW w AS (PARTITION BY c_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
)
SELECT c_custkey, o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS totalprice,
       price_rank, price_dense_rank, spend_quartile
FROM ranked WHERE price_rank <= 3
"""


@register(
    "w_ranking_top_orders",
    oracle=_RANKING_ORACLE,
    tags=("window", "ranking", "topk"),
    doc="Ranking-window family the reference never uses but the engine "
    "exposes (SURVEY §2.7 note): rank / dense_rank / ntile(4) per "
    "customer over order value, keeping each customer's top 3. "
    "Partition-local top-k: one shuffle on the window key, rank filter "
    "applied before anything wide. Deterministic via the full "
    "(price DESC, orderkey ASC) ordering.",
)
def w_ranking_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    w = Window.partitionBy("c_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(12,2)").cast("double").alias("totalprice"),
            F.rank().over(w).alias("price_rank"),
            F.dense_rank().over(w).alias("price_dense_rank"),
            F.ntile(4).over(w).alias("spend_quartile"),
        )
        .filter(F.col("price_rank") <= 3)
    )


# --- pivot: event_type x weekday matrix --------------------------------------------

_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]

_PIVOT_ORACLE = """
SELECT CAST(dayofweek(ts) + 1 AS INT) AS weekday,  -- DuckDB 0=Sun, Spark 1=Sun
    COUNT(*) FILTER (event_type = 'click') AS click_n,
    COUNT(*) FILTER (event_type = 'error') AS error_n,
    COUNT(*) FILTER (event_type = 'purchase') AS purchase_n,
    COUNT(*) FILTER (event_type = 'signup') AS signup_n,
    COUNT(*) FILTER (event_type = 'view') AS view_n
FROM events GROUP BY 1
"""


@register(
    "a_pivot_weekday_matrix",
    oracle=_PIVOT_ORACLE,
    tags=("aggregate", "pivot"),
    doc="PIVOT with a DECLARED value domain (event_type x weekday count "
    "matrix): the declared list keeps the schema static and skips the "
    "extra distinct-collection job an undeclared pivot runs on the "
    "driver. Compiles to one conditional aggregation — same shape as "
    "the reference's CASE-bucketed dashboard (A4, "
    "sql/enhanced_schema.sql:254-278).",
)
def a_pivot_weekday_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    pivoted = (
        events.select(F.dayofweek("ts").alias("weekday"), "event_type")
        .groupBy("weekday")
        .pivot("event_type", _PIVOT_TYPES)
        .count()
    )
    # pivot leaves NULL for empty cells; the CASE-count oracle yields 0
    return pivoted.select(
        "weekday",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"{t}_n") for t in _PIVOT_TYPES],
    )


# --- cube: all grouping-set combinations -------------------------------------------

_CUBE_ORACLE = """
SELECT event_type,
       CAST(dayofweek(ts) + 1 AS INT) AS weekday,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY CUBE (event_type, (dayofweek(ts) + 1))
"""


@register(
    "a_cube_type_weekday",
    oracle=_CUBE_ORACLE,
    tags=("aggregate", "extension"),
    doc="CUBE(event_type, weekday): all four grouping sets (detail, two "
    "marginals, grand total) in one pass — completes the grouping-sets "
    "family beside ROLLUP (a_rollup_daily) and PIVOT "
    "(a_pivot_weekday_matrix). One Expand + one shuffle, partial-agg "
    "eligible; the 4x row expansion happens before the combine, so "
    "shuffled volume is already reduced.",
)
def a_cube_type_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.cube(
        "event_type", F.dayofweek("ts").alias("weekday")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


# --- RANGE-frame window: trailing 7-day revenue ------------------------------------

_TRAILING_ORACLE = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day_num,
        SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
    FROM orders GROUP BY 1
)
SELECT day_num,
    CAST(rev AS DOUBLE) AS day_revenue,
    CAST(SUM(rev) OVER (ORDER BY day_num
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_7d_revenue
FROM daily ORDER BY day_num
"""


@register(
    "w_trailing_7d_revenue",
    oracle=_TRAILING_ORACLE,
    tags=("window", "range-frame"),
    doc="RANGE-frame window (the frame spec ROWS can't express): per-day "
    "revenue with a trailing-7-day RANGE sum — value-based framing skips "
    "missing days correctly where a ROWS frame would span them. The "
    "window runs over the per-day rollup (bounded by the calendar, not "
    "the fact table), so the no-partition spec is safe at any corpus "
    "size; sums stay decimal until the final double cast.",
)
def w_trailing_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.unix_date(F.col("o_orderdate").cast("date")).alias("day_num")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return (
        daily.select(
            "day_num",
            F.col("rev").cast("double").alias("day_revenue"),
            F.sum("rev").over(w).cast("double").alias("trailing_7d_revenue"),
        )
        .orderBy("day_num")
    )


# --- set ops: INTERSECT -------------------------------------------------------------

_INTERSECT_ORACLE = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'click'
ORDER BY user_id
"""


@register(
    "s_intersect_buyers_clickers",
    oracle=_INTERSECT_ORACLE,
    tags=("setop",),
    doc="Set operations (SURVEY §2.9): users who both clicked AND "
    "purchased, via INTERSECT (plans as a left-semi join over the "
    "distinct key sets — one shuffle per side). Completes the "
    "union/except/intersect family.",
)
def s_intersect_buyers_clickers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id")
    clickers = events.filter(F.col("event_type") == "click").select("user_id")
    return buyers.intersect(clickers).orderBy("user_id")


# --- ranking distribution functions: NTILE / PERCENT_RANK / CUME_DIST --------------

_NTILE_ORACLE = """
WITH rev AS (
    SELECT c.c_custkey, c.c_nationkey,
           CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                AS BIGINT) AS rev_c
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_nationkey
)
SELECT c_custkey, c_nationkey,
       CAST(CAST(rev_c AS DOUBLE) / 100.0 AS DOUBLE) AS revenue,
       CAST(NTILE(10) OVER w AS INT) AS decile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume_dist
FROM rev
WINDOW w AS (PARTITION BY c_nationkey ORDER BY rev_c, c_custkey)
ORDER BY c_nationkey, rev_c, c_custkey
"""


@register(
    "w_ntile_revenue_deciles",
    oracle=_NTILE_ORACLE,
    tags=("window", "ranking"),
    doc="Distribution window functions (NTILE + PERCENT_RANK + CUME_DIST "
    "in one pass): per-nation customer revenue deciles. PARTITION BY "
    "nation keeps every window partition bounded — the scale-correct "
    "form of global ranking (a no-partition NTILE would serialize the "
    "corpus on one reducer; see docs/SCALE.md on the packing prefix "
    "sum). The ORDER BY carries a custkey tiebreak so rank-based "
    "functions see no peer ties and both engines agree exactly; "
    "revenue is exact cents so the ordering itself cannot drift.",
)
def w_ntile_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
    rev = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum(cents).alias("rev_c"))
    )
    w = Window.partitionBy("c_nationkey").orderBy("rev_c", "c_custkey")
    return (
        rev.select(
            "c_custkey",
            "c_nationkey",
            (F.col("rev_c").cast("double") / F.lit(100.0)).cast("double").alias("revenue"),
            F.ntile(10).over(w).cast("int").alias("decile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume_dist"),
        )
        .orderBy("c_nationkey", "revenue", "c_custkey")
    )


# --- weekly cohort retention -------------------------------------------------------

_COHORT_ORACLE = """
WITH ev AS (
    SELECT user_id,
           datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS week_num
    FROM events
),
cohort AS (SELECT user_id, MIN(week_num) AS cohort_week FROM ev GROUP BY user_id)
SELECT c.cohort_week, e.week_num - c.cohort_week AS week_offset,
       COUNT(DISTINCT e.user_id) AS n_users
FROM ev e JOIN cohort c ON e.user_id = c.user_id
GROUP BY c.cohort_week, week_offset
ORDER BY c.cohort_week, week_offset
"""


@register(
    "a_cohort_retention",
    oracle=_COHORT_ORACLE,
    tags=("aggregate", "analytics"),
    doc="Weekly cohort retention: users bucketed by first-seen week, "
    "distinct-user counts per (cohort, week offset) — the product-"
    "analytics rollup the reference's journey/funnel queries stop "
    "short of. Week numbers are exact integer day-arithmetic (epoch "
    "days DIV 7 — no timezone or truncation semantics to disagree "
    "on). The first-seen week is a MIN window over the user "
    "partition — one shuffle and one scan of events, where the "
    "aggregate-then-join form scanned twice.",
)
def a_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_date(CAST(ts AS DATE)) DIV 7").alias("week_num"),
    )
    wu = Window.partitionBy("user_id")
    return (
        events.withColumn("cohort_week", F.min("week_num").over(wu))
        .groupBy("cohort_week", (F.col("week_num") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


# --- explicit GROUPING SETS with grouping_id ---------------------------------------

_GSETS_ORACLE = """
SELECT CAST(GROUPING(event_type, weekday) AS INT) AS gid,
       event_type,
       weekday,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM (
    SELECT event_type, CAST(dayofweek(ts) + 1 AS INT) AS weekday, value
    FROM events
)
GROUP BY GROUPING SETS ((event_type), (weekday), ())
ORDER BY gid, event_type, weekday
"""


@register(
    "a_grouping_sets",
    oracle=_GSETS_ORACLE,
    tags=("aggregate", "grouping-sets"),
    doc="Explicit GROUPING SETS — the shape ROLLUP/CUBE can't express "
    "(two independent marginals + grand total, NO (type, weekday) "
    "cells): per-type totals, per-weekday totals, and the grand total "
    "in ONE pass via Expand (3 output rows per input row feeding one "
    "partial-agg shuffle, vs three separate scans). grouping_id "
    "disambiguates the NULL-keyed rows exactly as the standard "
    "bitmask both engines implement.",
)
def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_type", F.dayofweek("ts").alias("weekday"), "value"
    )
    return (
        events.groupingSets(
            [["event_type"], ["weekday"], []], "event_type", "weekday"
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select("gid", "event_type", "weekday", "n_events", "sum_value")
        .orderBy("gid", "event_type", "weekday")
    )


# --- UNPIVOT (wide metrics -> long) -------------------------------------------------

_UNPIVOT_ORACLE = """
WITH daily AS (
    SELECT CAST(FLOOR(epoch(CAST(o_orderdate AS DATE))) AS BIGINT) AS day_s,
           CAST(COUNT(*) AS DOUBLE) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1
)
SELECT day_s, 'n_orders' AS metric, n_orders AS value FROM daily
UNION ALL
SELECT day_s, 'revenue' AS metric, revenue AS value FROM daily
ORDER BY day_s, metric
"""


@register(
    "a_unpivot_daily_metrics",
    oracle=_UNPIVOT_ORACLE,
    tags=("aggregate", "unpivot"),
    doc="UNPIVOT / melt: the per-day wide rollup (n_orders, revenue) "
    "reshaped to long (day, metric, value) rows via the native "
    "DataFrame unpivot (plans as Expand over the already-aggregated "
    "relation — one output row per metric per input row, no re-scan "
    "of the fact). The oracle states the same semantics as UNION ALL; "
    "counts are cast to double up front because unpivot requires one "
    "common value type.",
)
def a_unpivot_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.unix_seconds(
            F.col("o_orderdate").cast("date").cast("timestamp")
        ).alias("day_s")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
    )
    return daily.unpivot(
        ["day_s"], ["n_orders", "revenue"], "metric", "value"
    ).orderBy("day_s", "metric")


# --- funnel time-to-convert --------------------------------------------------------

_TTC_ORACLE = """
WITH firsts AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'view'
                    THEN CAST(FLOOR(epoch(ts)) AS BIGINT) END) AS t_view,
           MIN(CASE WHEN event_type = 'purchase'
                    THEN CAST(FLOOR(epoch(ts)) AS BIGINT) END) AS t_buy
    FROM events GROUP BY user_id
),
conv AS (
    SELECT user_id, t_buy - t_view AS delta_s FROM firsts
    WHERE t_view IS NOT NULL AND t_buy IS NOT NULL AND t_buy >= t_view
)
SELECT COUNT(*) AS n_converted,
       CAST(MIN(delta_s) AS BIGINT) AS min_s,
       quantile_cont(delta_s, 0.5) AS median_s,
       quantile_cont(delta_s, 0.9) AS p90_s,
       CAST(MAX(delta_s) AS BIGINT) AS max_s
FROM conv
"""


@register(
    "a_time_to_convert",
    oracle=_TTC_ORACLE,
    tags=("aggregate", "analytics"),
    doc="Funnel time-to-convert: per-user first view -> first purchase "
    "latency distribution (count, min, exact interpolated median/p90, "
    "max) — the duration companion to the A7 step-count funnel. Both "
    "firsts come from ONE conditional-MIN pass over events (no "
    "self-join); percentile interpolation matches quantile_cont, the "
    "a_pctl_latency-proven pairing, and runs on exact integer seconds.",
)
def a_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ts_s = F.unix_seconds("ts")
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", ts_s)).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", ts_s)).alias("t_buy"),
    )
    conv = firsts.filter(
        F.col("t_view").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_buy") >= F.col("t_view"))
    ).select((F.col("t_buy") - F.col("t_view")).alias("delta_s"))
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("delta_s").alias("min_s"),
        F.expr("percentile(delta_s, 0.5)").alias("median_s"),
        F.expr("percentile(delta_s, 0.9)").alias("p90_s"),
        F.max("delta_s").alias("max_s"),
    )


# --- gaps-and-islands: SCD2-style event-type history -------------------------------

_ISLANDS_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type, ts, event_id,
           CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                THEN 1 ELSE 0 END AS chg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
isl AS (
    SELECT *, CAST(SUM(chg) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island_id
    FROM seq
),
grp AS (
    SELECT user_id, island_id, ANY_VALUE(event_type) AS event_type,
           COUNT(*) AS n_events,
           CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS valid_from_s
    FROM isl GROUP BY user_id, island_id
)
SELECT user_id, island_id, event_type, n_events, valid_from_s,
       LEAD(valid_from_s) OVER (
           PARTITION BY user_id ORDER BY island_id) AS valid_to_s,
       (LEAD(valid_from_s) OVER (
           PARTITION BY user_id ORDER BY island_id) IS NULL) AS is_current
FROM grp
ORDER BY user_id, island_id
"""


@register(
    "m_scd2_type_history",
    oracle=_ISLANDS_ORACLE,
    tags=("mutation", "window", "scd2"),
    doc="Gaps-and-islands -> SCD2 type-2 history: consecutive same-type "
    "events per user collapse into validity intervals "
    "(valid_from/valid_to via LEAD, open-ended current row) — the "
    "dimension-history build every warehouse runs, and the island "
    "pattern (change-flag LAG + running SUM) no other catalog query "
    "exercises. All three windows share the per-user partition, so "
    "one shuffle serves the whole plan.",
)
def m_scd2_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    isl = events.select(
        "user_id", "event_type", "ts", "event_id", chg.alias("chg")
    ).withColumn(
        "island_id",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    grp = isl.groupBy("user_id", "island_id").agg(
        F.any_value("event_type").alias("event_type"),
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.unix_seconds("ts")).alias("valid_from_s"),
    )
    wi = Window.partitionBy("user_id").orderBy("island_id")
    return (
        grp.withColumn("valid_to_s", F.lead("valid_from_s").over(wi))
        .withColumn("is_current", F.col("valid_to_s").isNull())
        .select(
            "user_id", "island_id", "event_type", "n_events",
            "valid_from_s", "valid_to_s", "is_current",
        )
        .orderBy("user_id", "island_id")
    )


# --- event-type transition matrix (Markov counts) ----------------------------------

_MARKOV_ORACLE = f"""
WITH pairs AS (
    SELECT event_type AS from_type,
           LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
    FROM events
),
cnt AS (
    SELECT from_type, to_type, COUNT(*) AS n
    FROM pairs WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
),
tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_total FROM cnt GROUP BY from_type)
SELECT c.from_type, c.to_type, c.n,
       {sql_ratio_half_up("c.n", "t.row_total", 6)} AS p
FROM cnt c JOIN tot t ON c.from_type = t.from_type
ORDER BY c.from_type, c.to_type
"""


@register(
    "a_markov_transitions",
    oracle=_MARKOV_ORACLE,
    tags=("aggregate", "window", "analytics"),
    doc="Event-type transition matrix: per-user next-event pairing via "
    "LEAD, transition counts, and the conditional probability "
    "P(next | current) as an exact HALF_UP ratio against the row "
    "total — the first-order Markov view of user behavior (the "
    "journey-path A6 rollup's statistical summary). One per-user "
    "window shuffle + two count-carrying aggregates.",
)
def a_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    # barrier: cnt feeds both the row-total aggregate and the join —
    # without it each reference re-runs the per-user window over events;
    # the checkpointed relation is |types|^2 rows
    cnt = (
        pairs.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    tot = cnt.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    return (
        cnt.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            ratio_half_up(F.col("n"), F.col("row_total"), 6).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


# --- exact sliding-window distinct (7-day rolling active users) --------------------

_SLIDING_DISTINCT_ORACLE = """
WITH du AS (
    SELECT DISTINCT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num,
           user_id
    FROM events
),
bounds AS (SELECT MIN(day_num) AS d0, MAX(day_num) AS d1 FROM du),
cover AS (
    SELECT u.user_id, c.cd AS day_num
    FROM du u, bounds b,
         unnest(generate_series(u.day_num, u.day_num + 6)) AS c(cd)
    WHERE c.cd BETWEEN b.d0 AND b.d1
)
SELECT day_num, COUNT(DISTINCT user_id) AS n_active_7d
FROM cover
GROUP BY day_num
ORDER BY day_num
"""


@register(
    "a_sliding_distinct_users",
    oracle=_SLIDING_DISTINCT_ORACLE,
    tags=("aggregate", "window", "analytics"),
    doc="EXACT sliding-window distinct — 7-day rolling active users, the "
    "aggregate a RANGE frame cannot compute (COUNT(DISTINCT) isn't "
    "frame-able) and most engines approximate. Banded-expansion form: "
    "each (day,user) row (already deduped, so at most one row per "
    "user-day) fans out to the <=7 window-end days it covers, then one "
    "distinct-count per day — expansion factor = window length, a "
    "constant, vs the unbounded state of a naive self-join. unix_date "
    "integer day arithmetic keeps both engines exactly aligned.",
)
def a_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    du = events.select(
        F.unix_date(F.col("ts").cast("date")).alias("day_num"), "user_id"
    ).distinct()
    bounds = du.agg(
        F.min("day_num").alias("d0"), F.max("day_num").alias("d1")
    )
    cover = (
        du.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("day_num"), F.col("day_num") + 6)
            ).alias("day_num"),
            "d0",
            "d1",
        )
        .filter(F.col("day_num").between(F.col("d0"), F.col("d1")))
    )
    return (
        cover.groupBy("day_num")
        .agg(F.count_distinct("user_id").alias("n_active_7d"))
        .orderBy("day_num")
    )


# --- linear multi-touch attribution ------------------------------------------------

_ATTRIB_ORACLE = f"""
WITH purch AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
touch AS (
    SELECT event_id, user_id, ts, event_type FROM events
    WHERE event_type IN ('view', 'click')
),
pairs AS (
    SELECT p.event_id AS p_id, t.event_type AS touch_type
    FROM purch p JOIN touch t
      ON p.user_id = t.user_id
     AND t.ts >= p.ts - INTERVAL 1 HOUR
     AND t.ts <  p.ts
),
per_pt AS (
    SELECT p_id, touch_type, COUNT(*) AS c FROM pairs GROUP BY p_id, touch_type
),
with_n AS (
    SELECT p_id, touch_type, c,
           CAST(SUM(c) OVER (PARTITION BY p_id) AS BIGINT) AS n
    FROM per_pt
)
SELECT touch_type,
       CAST(SUM(c) AS BIGINT) AS n_touches,
       CAST(SUM(CAST({sql_ratio_half_up("c * 1000", "n", 0)} AS BIGINT)) AS BIGINT)
           AS credit_millis
FROM with_n
GROUP BY touch_type
ORDER BY touch_type
"""


@register(
    "a_attribution_linear",
    oracle=_ATTRIB_ORACLE,
    tags=("aggregate", "analytics", "join"),
    doc="Linear multi-touch attribution: each purchase splits one unit "
    "of credit equally across its preceding-hour view/click touches "
    "(time-bucketed interval join, operators/rangejoin.py — never "
    "per-key quadratic). Per-purchase credit is exact-integer HALF_UP "
    "millicredits so the cross-purchase SUM is an integer — a float "
    "1/n sum would be aggregation-order-dependent and break the "
    "cross-engine hash.",
)
def a_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from iheardai_data_pipeline_spark.operators.rangejoin import interval_join

    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    touch = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", "ts", "event_type"
    )
    joined = interval_join(
        purch, touch, on=["user_id"], left_ts="ts", right_ts="ts",
        lower_s=-3600.0, upper_s=0.0,
    ).filter(F.col("ts_r") < F.col("ts"))
    per_pt = joined.groupBy(
        F.col("event_id").alias("p_id"), F.col("event_type_r").alias("touch_type")
    ).agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c").over(Window.partitionBy("p_id"))
    with_n = per_pt.withColumn("n", n)
    credit_m = ratio_half_up(F.col("c") * 1000, F.col("n"), 0).cast("long")
    return (
        with_n.groupBy("touch_type")
        .agg(
            F.sum("c").alias("n_touches"),
            F.sum(credit_m).alias("credit_millis"),
        )
        .orderBy("touch_type")
    )


# --- winsorization bounds: exact percentile fences + outlier counts ----------------

_WINSORIZE_ORACLE = """
WITH b AS (
  SELECT event_type,
         quantile_cont(value, 0.01) AS lo,
         quantile_cont(value, 0.99) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       count(*) AS n,
       CAST(sum(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
       CAST(sum(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
       round(any_value(b.lo), 6) AS p01,
       round(any_value(b.hi), 6) AS p99
FROM events e JOIN b USING (event_type)
GROUP BY e.event_type
"""


@register(
    "a_winsorize_bounds",
    oracle=_WINSORIZE_ORACLE,
    tags=("aggregate", "percentile"),
    doc="Winsorization fences: exact p01/p99 per event type (Spark "
    "percentile() and DuckDB quantile_cont share the p*(n-1) linear "
    "interpolation, verified bit-identical) plus how many rows each "
    "fence would clamp. Two aggregates: the 5-row bounds relation "
    "broadcasts back onto the fact scan — the clamp pass a real "
    "winsorizing writer would run.",
)
def a_winsorize_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bounds = events.groupBy("event_type").agg(
        F.expr("percentile(value, array(0.01, 0.99))").alias("p")
    ).select(
        "event_type", F.col("p")[0].alias("lo"), F.col("p")[1].alias("hi")
    )
    return (
        events.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("value") < F.col("lo")).cast("long")).alias("n_below"),
            F.sum((F.col("value") > F.col("hi")).cast("long")).alias("n_above"),
            F.round(F.first("lo"), 6).alias("p01"),
            F.round(F.first("hi"), 6).alias("p99"),
        )
    )
