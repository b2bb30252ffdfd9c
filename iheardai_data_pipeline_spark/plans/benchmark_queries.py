"""Headline scan/join/agg benchmark queries (TPC-H-shaped).

The reference publishes no query benchmark (BASELINE.md), so the bench
headliners are the classic OLAP shapes its SQL layer delegates to the
warehouse: a wide aggregation over the biggest fact (Q1 shape) and a
multi-way dim/fact join with selective filters (Q5 shape). Both are
written scale-first: filters reach the parquet scan, dims broadcast,
decimal arithmetic keeps the oracle hash order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.functions.exact import (
    int_sum,
    ratio_half_up,
    sql_int_sum,
    sql_ratio_half_up,
)
from iheardai_data_pipeline_spark.plans.catalog import register
from iheardai_data_pipeline_spark.sources.batch import load_table

_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(4,2)))
             * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
    {sql_ratio_half_up(sql_int_sum("l_quantity", 100, "DECIMAL(12,2)"), "COUNT(*) * 100", 4)} AS avg_qty,
    {sql_ratio_half_up(sql_int_sum("l_extendedprice", 100, "DECIMAL(12,2)"), "COUNT(*) * 100", 4)} AS avg_price,
    {sql_ratio_half_up(sql_int_sum("l_discount", 100, "DECIMAL(4,2)"), "COUNT(*) * 100", 4)} AS avg_disc,
    COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register(
    "q1_pricing_summary",
    oracle=_Q1_ORACLE,
    tags=("benchmark", "aggregate"),
    doc="Q1-shape pricing summary: scan-heavy groupBy with 8 aggregates and "
    "a pushed-down date filter over the largest fact table.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    disc_price = price * (F.lit(1) - disc)
    charge = disc_price * (F.lit(1) + tax)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            ratio_half_up(
                int_sum("l_quantity", 100, "decimal(12,2)"), F.count(F.lit(1)) * 100, 4
            ).alias("avg_qty"),
            ratio_half_up(
                int_sum("l_extendedprice", 100, "decimal(12,2)"), F.count(F.lit(1)) * 100, 4
            ).alias("avg_price"),
            ratio_half_up(
                int_sum("l_discount", 100, "decimal(4,2)"), F.count(F.lit(1)) * 100, 4
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q5_ORACLE = """
SELECT n.n_name AS nation,
    CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o    ON c.c_custkey = o.o_custkey
JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n    ON s.s_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
"""


@register(
    "q5_local_supplier_volume",
    oracle=_Q5_ORACLE,
    tags=("benchmark", "join"),
    doc="Q5-shape multi-way join: two big facts + three broadcast dims with "
    "selective pushed-down filters; same-nation customer/supplier predicate.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue_expr = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        cust.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            ),
            cust.c_custkey == F.col("o_custkey"),
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(revenue_expr).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "nation")
    )


# --- Q3 shape: fact-fact join + selective filters + top-k --------------------------

_Q3_ORACLE = """
SELECT l_orderkey,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
    CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS orderdate_s,
    o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register(
    "q3_shipping_priority",
    oracle=_Q3_ORACLE,
    tags=("benchmark", "join", "topk"),
    doc="Q3 shape: 3-way fact join with selective per-table filters and a "
    "revenue top-k. Filters push to each scan; customer(BUILDING) "
    "broadcasts under AQE; revenue is decimal-summed for hash stability.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    revenue = F.sum(
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("double")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.unix_seconds(F.col("o_orderdate").cast("timestamp")).alias("orderdate_s"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --- Q6 shape: pure filter + aggregate (pushdown showcase) -------------------------

_Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register(
    "q6_forecast_revenue",
    oracle=_Q6_ORACLE,
    tags=("benchmark", "scan"),
    doc="Q6 shape: pure filter+aggregate — every predicate reaches "
    "PushedFilters on the parquet scan, zero joins, one exchange for the "
    "single-group aggregate.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * F.col("l_discount").cast("decimal(4,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- Q4 shape: EXISTS semi-join ----------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "q4_order_priority",
    oracle=_Q4_ORACLE,
    tags=("benchmark", "join", "semijoin"),
    doc="Q4 shape: EXISTS decorrelated to a LEFT SEMI join (reference "
    "analog: the validation split's implicit anti-join inverted, SURVEY "
    "§2.6) — orders with at least one line shipped >90 days after the "
    "order date, counted by priority. The semi-join keeps the build side "
    "duplicate-free without a distinct, and the date filter prunes the "
    "probe scan.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- salted skew join --------------------------------------------------------------

_SALTED_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "x_skew_salted_join",
    oracle=_SALTED_ORACLE,
    tags=("benchmark", "join", "skew"),
    doc="Skew-tolerant fact join: lineitem->orders through salted_join "
    "(key spread over 8 reducers via a non-key salt; small side "
    "replicated 8x). Row-identical to the plain equi-join — the oracle "
    "IS the plain join — while bounding any hot key's reducer share at "
    "1/n_salts. The plan-level answer to skew where AQE's runtime "
    "split cannot apply (operators/skewjoin.py).",
)
def x_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iheardai_data_pipeline_spark.operators.skewjoin import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, orders, on="l_orderkey", salt_on="l_linenumber", n_salts=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )


# --- Q13 shape: outer-join histogram (count of counts, zeros kept) -----------------

_Q13_ORACLE = """
WITH per_cust AS (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register(
    "q13_customer_distribution",
    oracle=_Q13_ORACLE,
    tags=("benchmark", "join", "outer"),
    doc="Q13 shape: customer order-count distribution — LEFT OUTER join "
    "so zero-order customers survive (COUNT(col) skips their NULLs), "
    "then a second aggregation over the first's output. The re-agg "
    "input is one row per customer, so the second shuffle moves "
    "already-reduced data.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --- Q17 shape: per-group average as a join threshold ------------------------------

_Q17_ORACLE = """
WITH part_avg AS (
    SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_threshold
    FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly_raw,
       COUNT(*) AS n_small_lots
FROM lineitem l JOIN part_avg pa ON l.l_partkey = pa.l_partkey
WHERE l.l_quantity < pa.qty_threshold
"""


@register(
    "q17_small_lot_revenue",
    oracle=_Q17_ORACLE,
    tags=("benchmark", "join", "subquery"),
    doc="Q17 shape: correlated scalar subquery (per-part average "
    "quantity) decorrelated into an aggregate + self-join — lines "
    "under 20% of their part's average quantity. The per-part "
    "aggregate is partial-agg reduced before the join, so the "
    "self-join's build side is one row per part, broadcast-eligible "
    "under AQE.",
)
def q17_small_lot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part_avg = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double") / 7.0)
            .cast("double")
            .alias("avg_yearly_raw"),
            F.count(F.lit(1)).alias("n_small_lots"),
        )
    )


# --- Q18 shape: HAVING-filtered IN-subquery (aggregate semi-join) ------------------

_Q18_ORACLE = """
WITH big AS (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 200
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
    CAST(FLOOR(epoch(o.o_orderdate)) AS BIGINT) AS order_date_s,
    CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS totalprice,
    CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY totalprice DESC, o.o_orderkey
LIMIT 100
"""


@register(
    "q18_large_volume_customers",
    oracle=_Q18_ORACLE,
    tags=("benchmark", "join", "subquery"),
    doc="Q18 shape: large-volume customers — IN over a HAVING-filtered "
    "aggregate subquery (plans as a semi-join against the grouped key "
    "set; the aggregate runs once, map-side-combined), then a 3-way "
    "join re-aggregated and top-100'd. The decorrelated-aggregate "
    "semi-join pattern q4/q17 don't cover.",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("s"))
        .filter(F.col("s") > 200)
        .select("l_orderkey")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(big, "l_orderkey", "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(qty).cast("double").alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_seconds(F.col("o_orderdate").cast("timestamp")).alias("order_date_s"),
            F.col("o_totalprice").cast("decimal(12,2)").cast("double").alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )
