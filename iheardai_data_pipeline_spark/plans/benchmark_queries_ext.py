"""Extended TPC-H-shaped benchmark queries (Q2/Q7-Q11/Q14-Q16/Q19-Q22 adapted).

The rig's TPC-H-ish schema is reduced (no partsupp, no
l_shipmode/commitdate/receiptdate, no c_phone), so each classic query is
adapted to the available columns while preserving the PLAN SHAPE that
makes it interesting:

- q7/q8/q9: multi-way fact/dim joins with the nation dim joined twice
  under different roles (supplier-side and customer-side).
- q8/q14: conditional-share ratios computed in exact integer cents via
  ``ratio_half_up`` so the Spark and DuckDB doubles are bit-identical.
- q11/q15/q22: scalar-subquery thresholds decorrelated into a broadcast
  one-row join; q11 compares in EXACT integer space
  (value_c * n_parts > total_c) instead of multiplying by a float
  fraction.
- q16/q22: NOT IN / anti-join with a non-nullable key (safe left_anti).
- q19: three OR'd predicate branches — Catalyst pushes the disjunction
  to the scan and prunes with min/max stats.
- q20/q21: nested semi-join chains; q21 is the EXISTS + NOT EXISTS pair
  on a self-joined fact with a non-equi component.

Reference analog: these are the warehouse-side analytics the reference
delegates to SQL (SURVEY.md §2.5/§2.6 notes); none exist as named
queries there, so they are engine extensions widening join/subquery
coverage.

Determinism: money sums go through DECIMAL before the final DOUBLE
cast; averages/shares use the exact-integer HALF_UP ratio from
``functions.exact``; every LIMIT has a total-order ORDER BY tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.functions.exact import (
    ratio_half_up,
    sql_ratio_half_up,
)
from iheardai_data_pipeline_spark.plans.catalog import register
from iheardai_data_pipeline_spark.sources.batch import load_table


def _vol_dec() -> F.Column:
    """Exact discounted revenue: DECIMAL(12,2) * (1 - DECIMAL(4,2)), scale 4."""
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )


_VOL_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
# scale-4 decimal * 10000 is integral: exact cents*100 as BIGINT
_VOL_C_SQL = f"CAST({_VOL_SQL} * 10000 AS BIGINT)"


def _vol_c() -> F.Column:
    return (_vol_dec() * 10000).cast("long")


# --- Q7: volume shipping between two nations (nation dim joined twice) -------------

_Q7_ORACLE = """
WITH shipping AS (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS volume
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_5' AND n2.n_name = 'NATION_6')
        OR (n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_5'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register(
    "q7_volume_shipping",
    oracle=_Q7_ORACLE,
    tags=("benchmark", "join"),
    doc="Q7 shape: bilateral trade volume — the nation dim joins TWICE "
    "under different roles (supplier nation, customer nation), with a "
    "symmetric two-branch predicate. Both nation sides broadcast; the "
    "shipdate range pushes to the lineitem scan.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_5") & (F.col("cust_nation") == "NATION_6")
    rpair = (F.col("supp_nation") == "NATION_6") & (F.col("cust_nation") == "NATION_5")
    return (
        supp.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair | rpair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_vol_dec()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- Q8: national market share within a region's market ----------------------------

_Q8_ORACLE = f"""
WITH all_sales AS (
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           {_VOL_C_SQL} AS volume_c,
           n2.n_name AS supp_nation
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN region r   ON n1.n_regionkey = r.r_regionkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'AMERICA'
      AND p.p_type = 'PROMO'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
)
SELECT o_year,
       {sql_ratio_half_up(
           "SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume_c ELSE 0 END)",
           "SUM(volume_c)", 4)} AS mkt_share
FROM all_sales
GROUP BY o_year
ORDER BY o_year
"""


@register(
    "q8_market_share",
    oracle=_Q8_ORACLE,
    tags=("benchmark", "join", "ratio"),
    doc="Q8 shape: a 7-way join (nation twice: customer's region market, "
    "supplier's nationality) feeding a conditional-share ratio per year. "
    "The share is computed in exact integer cents*100 via HALF_UP ratio "
    "so both engines emit the identical double.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol_c = _vol_c()
    num = F.sum(F.when(F.col("supp_nation") == "NATION_3", vol_c).otherwise(F.lit(0)))
    den = F.sum(vol_c)
    return (
        F.broadcast(part)
        .join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(ratio_half_up(num, den, 4).alias("mkt_share"))
        .orderBy("o_year")
    )


# --- Q9: product-line profit by nation and year ------------------------------------
# No partsupp/ps_supplycost in the rig schema: cost is proxied as
# p_retailprice * l_quantity (documented deviation; the JOIN/AGG shape —
# part+supplier+lineitem+orders+nation with a two-term profit — is intact).

_Q9_ORACLE = """
WITH profit AS (
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS rev,
           CAST(p.p_retailprice AS DECIMAL(12,2))
               * CAST(l.l_quantity AS DECIMAL(12,2)) AS cost
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%bolt%'
)
SELECT nation, o_year,
       CAST(SUM(rev) - SUM(cost) AS DOUBLE) AS profit
FROM profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@register(
    "q9_product_profit",
    oracle=_Q9_ORACLE,
    tags=("benchmark", "join"),
    doc="Q9 shape: product-line profit by supplier nation and order year "
    "(cost proxied by p_retailprice*quantity — the rig schema has no "
    "partsupp). Both profit terms are summed as exact decimals and "
    "subtracted BEFORE the double cast, so the hash is order-insensitive.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cost = F.col("p_retailprice").cast("decimal(12,2)") * F.col("l_quantity").cast(
        "decimal(12,2)"
    )
    return (
        F.broadcast(part)
        .join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg((F.sum(_vol_dec()) - F.sum(cost)).cast("double").alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# --- Q10: returned-item losses, top customers --------------------------------------

_Q10_ORACLE = """
SELECT c.c_custkey, c.c_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal,
       n.n_name AS nation
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@register(
    "q10_returned_items",
    oracle=_Q10_ORACLE,
    tags=("benchmark", "join", "topk"),
    doc="Q10 shape: revenue lost to returns per customer in one quarter, "
    "top-20. The returnflag filter pushes to the lineitem scan; the "
    "quarter filter prunes orders before the join; nation broadcasts.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_vol_dec()).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("decimal(12,2)").cast("double").alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --- Q11: important part values (exact-integer scalar-subquery threshold) ----------

_Q11_ORACLE = f"""
WITH val AS (
    SELECT l.l_partkey AS partkey,
           CAST(SUM({_VOL_C_SQL}) AS BIGINT) AS value_c
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_2'
    GROUP BY l.l_partkey
),
tot AS (SELECT CAST(SUM(value_c) AS BIGINT) AS total_c,
               COUNT(*) AS n_parts FROM val)
SELECT v.partkey,
       CAST(CAST(v.value_c AS DOUBLE) / 10000.0 AS DOUBLE) AS part_value
FROM val v, tot t
WHERE v.value_c * t.n_parts > t.total_c
ORDER BY part_value DESC, v.partkey
"""


@register(
    "q11_important_values",
    oracle=_Q11_ORACLE,
    tags=("benchmark", "subquery"),
    doc="Q11 shape: parts whose single-nation inventory value exceeds "
    "the MEAN part value (scale-free, so the query stays selective-but-"
    "non-empty at every SF) — the scalar-subquery threshold decorrelates "
    "to a broadcast one-row cross join, and the comparison stays in "
    "EXACT integer space (value_c * n_parts > total_c) instead of "
    "multiplying by a float fraction, so no engine-dependent rounding "
    "at the cut line.",
)
def q11_important_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    val = (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_vol_c()).alias("value_c"))
        # barrier: val feeds both the total and the threshold filter —
        # without it the fact join re-runs per reference (the CTE
        # materialization a warehouse would do); per-part rows are small
        .localCheckpoint()
    )
    tot = val.agg(
        F.sum("value_c").alias("total_c"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value_c") * F.col("n_parts") > F.col("total_c"))
        .select(
            "partkey",
            (F.col("value_c").cast("double") / F.lit(10000.0))
            .cast("double")
            .alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "partkey")
    )


# --- Q14: promotion revenue share ---------------------------------------------------

_Q14_ORACLE = f"""
SELECT {sql_ratio_half_up(
    "100 * SUM(CASE WHEN p_type = 'PROMO' THEN " + _VOL_C_SQL + " ELSE 0 END)",
    "SUM(" + _VOL_C_SQL + ")", 4)} AS promo_share,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-05-01 00:00:00'
"""


@register(
    "q14_promo_revenue",
    oracle=_Q14_ORACLE,
    tags=("benchmark", "join", "ratio"),
    doc="Q14 shape: percent of two-month revenue from PROMO parts — a "
    "fact/dim join feeding a single conditional-share aggregate, exact "
    "integer HALF_UP ratio for the cross-engine-stable percentage.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-05-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol_c = _vol_c()
    num = F.sum(F.when(F.col("p_type") == "PROMO", vol_c).otherwise(F.lit(0))) * 100
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            ratio_half_up(num, F.sum(vol_c), 4).alias("promo_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- Q15: top supplier(s) by quarterly revenue (scalar MAX subquery) ---------------

_Q15_ORACLE = f"""
WITH revenue AS (
    SELECT l_suppkey,
           CAST(SUM({_VOL_C_SQL}) AS BIGINT) AS total_c
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(CAST(r.total_c AS DOUBLE) / 10000.0 AS DOUBLE) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.l_suppkey
WHERE r.total_c = (SELECT MAX(total_c) FROM revenue)
ORDER BY s.s_suppkey
"""


@register(
    "q15_top_supplier",
    oracle=_Q15_ORACLE,
    tags=("benchmark", "subquery"),
    doc="Q15 shape: supplier(s) achieving the maximum quarterly revenue — "
    "the revenue CTE is computed once, its scalar MAX broadcasts back "
    "as a one-row join, and the tie set (not just one row) survives, "
    "matching the SQL semantics. Revenue is exact cents*100 so the MAX "
    "comparison has no float ambiguity.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    # barrier: revenue feeds both the MAX scalar and the tie-set join
    revenue = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_vol_c()).alias("total_c"))
        .localCheckpoint()
    )
    mx = revenue.agg(F.max("total_c").alias("max_c"))
    return (
        supp.join(revenue, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(mx), F.col("total_c") == F.col("max_c"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_c").cast("double") / F.lit(10000.0))
            .cast("double")
            .alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# --- Q16: supplier counts per part attribute, NOT IN exclusion ---------------------

_Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@register(
    "q16_supplier_counts",
    oracle=_Q16_ORACLE,
    tags=("benchmark", "join", "antijoin"),
    doc="Q16 shape: distinct-supplier counts per (brand,type,size) with a "
    "NOT IN supplier exclusion. s_suppkey is non-nullable so NOT IN "
    "planes as a plain LEFT ANTI (the null-semantics trap doesn't "
    "apply); the IN-list size predicate prunes the part scan.",
)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7"))
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(excluded, "l_suppkey", "left_anti")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --- Q19: disjunctive multi-branch predicates --------------------------------------

_Q19_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


@register(
    "q19_disjunctive_revenue",
    oracle=_Q19_ORACLE,
    tags=("benchmark", "join", "scan"),
    doc="Q19 shape: three OR'd brand/size/quantity branches over a "
    "fact/dim join. Catalyst extracts the common l_quantity bounds "
    "([1,30]) as a pushable conjunct and prunes row groups with "
    "min/max stats; the full disjunction evaluates post-join.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    b1 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#21")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(b1 | b2 | b3)
        .agg(
            F.sum(_vol_dec()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- Q20: suppliers with excess inventory (nested semi chain) ----------------------

_Q20_ORACLE = """
WITH promo_parts AS (
    SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
),
shipped AS (
    SELECT l_suppkey
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM promo_parts)
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 45
)
SELECT s.s_name, n.n_name AS nation
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name IN ('NATION_4', 'NATION_9')
  AND s.s_suppkey IN (SELECT l_suppkey FROM shipped)
ORDER BY s.s_name
"""


@register(
    "q20_excess_suppliers",
    oracle=_Q20_ORACLE,
    tags=("benchmark", "semijoin"),
    doc="Q20 shape: a nested semi-join chain — part-name filter semi-joins "
    "into lineitem, a per-(supplier,part) HAVING aggregate produces the "
    "supplier key set, which semi-joins into the nation-filtered "
    "supplier dim. Each stage reduces before the next join.",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty"))
        .filter(F.col("qty") > 45)
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_4", "NATION_9")
    )
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(shipped, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


# --- Q21: sole-returning supplier in multi-supplier orders (EXISTS + NOT EXISTS) ---
# No l_commitdate/receiptdate in the rig schema: "kept orders waiting" is
# adapted to "sole supplier with a returned line in a finished
# multi-supplier order" — the correlated EXISTS + NOT EXISTS pair on a
# self-joined fact (the plan shape that makes Q21 hard) is preserved.

_Q21_ORACLE = """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
JOIN nation n    ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n.n_name IN ('NATION_0', 'NATION_1')
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
"""


@register(
    "q21_sole_returner",
    oracle=_Q21_ORACLE,
    tags=("benchmark", "semijoin", "antijoin"),
    doc="Q21 shape: correlated EXISTS + NOT EXISTS on a self-joined fact "
    "— suppliers who were the ONLY supplier with a returned line in a "
    "finished multi-supplier order (adapted: no commit/receipt dates in "
    "the rig schema). Planes as LEFT SEMI then LEFT ANTI on "
    "(orderkey, suppkey<>) with the non-equi component in the join "
    "condition, exactly how Catalyst decorrelates the SQL.",
)
def q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_0", "NATION_1")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    base = (
        l1.join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(
            l2,
            (F.col("l2_orderkey") == F.col("l_orderkey"))
            & (F.col("l2_suppkey") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3_orderkey") == F.col("l_orderkey"))
            & (F.col("l3_suppkey") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    return (
        base.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# --- Q22: idle high-balance customers (scalar AVG threshold + anti join) -----------

_Q22_ORACLE = f"""
WITH threshold AS (
    SELECT {sql_ratio_half_up(
        "SUM(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT))",
        "COUNT(*) * 100", 4)} AS avg_bal
    FROM customer
    WHERE c_acctbal > 0.0
      AND c_nationkey IN (0, 5, 10, 15, 20)
),
idle AS (
    SELECT c.c_nationkey, c.c_acctbal
    FROM customer c, threshold t
    WHERE c.c_nationkey IN (0, 5, 10, 15, 20)
      AND CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) AS DOUBLE) > t.avg_bal
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
)
SELECT c_nationkey AS nation_key,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM idle
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@register(
    "q22_idle_customers",
    oracle=_Q22_ORACLE,
    tags=("benchmark", "subquery", "antijoin"),
    doc="Q22 shape: customers above the positive-balance average (scalar "
    "AVG subquery — computed as an exact integer-cents HALF_UP ratio so "
    "the threshold double is engine-identical) with no RECENT orders "
    "(LEFT ANTI to the date-filtered orders; 'never ordered' is empty "
    "in this fixture — every customer orders), rolled up by nation. "
    "The anti-join build side is just the recent o_custkey set, "
    "broadcast-eligible after the date filter.",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(0, 5, 10, 15, 20)
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    cents = (F.col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")
    threshold = cust.filter(F.col("c_acctbal") > 0.0).agg(
        ratio_half_up(F.sum(cents), F.count(F.lit(1)) * 100, 4).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal").cast("decimal(12,2)").cast("double") > F.col("avg_bal"))
        .join(orders, "c_custkey", "left_anti")
        .groupBy(F.col("c_nationkey").alias("nation_key"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double").alias(
                "totacctbal"
            ),
        )
        .orderBy("nation_key")
    )


# --- Q2: min-cost supplier per part (correlated MIN decorrelated) ------------------
# No partsupp/ps_supplycost: the correlated MIN runs over lineitem unit
# prices instead — same decorrelation (per-group MIN + equality join back).

_Q2_ORACLE = """
WITH cand AS (
    SELECT l.l_partkey, l.l_suppkey, l.l_extendedprice
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size = 5 AND p.p_type = 'STANDARD'
),
mins AS (
    SELECT l_partkey, MIN(l_extendedprice) AS min_price
    FROM cand GROUP BY l_partkey
)
SELECT DISTINCT c.l_partkey AS partkey, s.s_suppkey AS suppkey, s.s_name,
       n.n_name AS nation,
       CAST(m.min_price AS DOUBLE) AS min_price
FROM cand c
JOIN mins m ON c.l_partkey = m.l_partkey AND c.l_extendedprice = m.min_price
JOIN supplier s ON c.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
ORDER BY min_price, partkey, suppkey
"""


@register(
    "q2_min_cost_supplier",
    oracle=_Q2_ORACLE,
    tags=("benchmark", "subquery", "join"),
    doc="Q2 shape: the correlated MIN subquery (cheapest offer per part) "
    "decorrelated into a per-part MIN aggregate joined back on "
    "(partkey, price=min) — ties kept, as SQL requires. MIN of doubles "
    "is exact so the equality join-back is engine-safe; the part filter "
    "broadcasts into the fact before the aggregate.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 5) & (F.col("p_type") == "STANDARD")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    cand = li.join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    mins = cand.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cand.join(
            mins,
            (F.col("l_partkey") == F.col("m_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("s_suppkey").alias("suppkey"),
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("min_price").cast("double").alias("min_price"),
        )
        .distinct()
        .orderBy("min_price", "partkey", "suppkey")
    )


# --- FULL OUTER reconciliation ------------------------------------------------------

_FULL_OUTER_ORACLE = """
WITH order_days AS (
    SELECT CAST(FLOOR(epoch(CAST(o_orderdate AS DATE))) AS BIGINT) / 86400 AS day_num,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1
),
event_days AS (
    SELECT CAST(FLOOR(epoch(CAST(ts AS DATE))) AS BIGINT) / 86400 AS day_num,
           COUNT(*) AS n_events
    FROM events GROUP BY 1
)
SELECT CAST(COALESCE(o.day_num, e.day_num) AS BIGINT) AS day_num,
       COALESCE(o.n_orders, 0) AS n_orders,
       COALESCE(e.n_events, 0) AS n_events,
       (o.day_num IS NULL OR e.day_num IS NULL) AS one_sided
FROM order_days o FULL OUTER JOIN event_days e ON o.day_num = e.day_num
ORDER BY day_num
"""


@register(
    "j_full_outer_reconcile",
    oracle=_FULL_OUTER_ORACLE,
    tags=("benchmark", "join", "outer"),
    doc="FULL OUTER reconciliation — the ETL audit shape: per-day order "
    "counts vs per-day event counts, keeping days present on EITHER "
    "side with zeros filled and a one-sided flag. Completes the join-"
    "type family (inner/left/semi/anti/cross covered elsewhere). Both "
    "inputs are pre-aggregated to day grain, so the full-outer "
    "sort-merge joins two already-reduced relations.",
)
def j_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    day_of = lambda c: F.expr(f"unix_seconds(CAST(CAST({c} AS DATE) AS TIMESTAMP)) DIV 86400")
    order_days = orders.groupBy(day_of("o_orderdate").alias("o_day")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    event_days = events.groupBy(day_of("ts").alias("e_day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return (
        order_days.join(
            event_days, F.col("o_day") == F.col("e_day"), "full_outer"
        )
        .select(
            F.coalesce("o_day", "e_day").alias("day_num"),
            F.coalesce("n_orders", F.lit(0).cast("long")).alias("n_orders"),
            F.coalesce("n_events", F.lit(0).cast("long")).alias("n_events"),
            (F.col("o_day").isNull() | F.col("e_day").isNull()).alias("one_sided"),
        )
        .orderBy("day_num")
    )
