"""Bucketed co-located joins: the write-once/shuffle-never index analog."""

from __future__ import annotations

from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.sources.batch import load_table, write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", n_buckets=8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "li_b", "o_orderkey", n_buckets=8
    )
    try:
        joined = spark.table("li_b").join(spark.table("orders_b"), "o_orderkey")
        got = joined.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
        # disable broadcast so the join would otherwise shuffle both sides
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            got.collect()
            plan = got._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "SortMergeJoin" in plan
        # and the answer equals the plain-parquet join
        want = {
            (r["o_orderpriority"], r["n"])
            for r in li.withColumnRenamed("l_orderkey", "o_orderkey")
            .join(orders, "o_orderkey")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert {(r["o_orderpriority"], r["n"]) for r in got.collect()} == want
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS li_b")
