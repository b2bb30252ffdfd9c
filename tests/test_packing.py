"""Two-level prefix sum == naive global window, and plan stays spread."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.operators.packing import (
    token_budget_shards,
    with_global_running_total,
)


@pytest.fixture(scope="module")
def spark():
    from iheardai_data_pipeline_spark.session import get_spark

    return get_spark(app_name="test-packing")


def _naive(df, order_col, value_col):
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    return df.withColumn(
        "start_offset", F.coalesce(F.sum(value_col).over(w), F.lit(0)).cast("long")
    )


def test_matches_naive_global_cumsum(spark):
    # ids with gaps + values crossing bucket boundaries; bucket_size
    # small so many buckets are exercised, incl. empty ones
    rows = [(i * 7 % 997, (i * 13) % 50) for i in range(500)]
    rows = [(k, v) for k, v in dict(rows).items()]  # unique keys
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = (
        with_global_running_total(df, "doc_id", "n", bucket_size=16)
        .orderBy("doc_id")
        .collect()
    )
    want = _naive(df, "doc_id", "n").orderBy("doc_id").collect()
    assert [(r["doc_id"], r["start_offset"]) for r in got] == [
        (r["doc_id"], r["start_offset"]) for r in want
    ]


def test_shard_assignment_boundaries(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 10)], "doc_id long, n long"
    )
    out = {
        r["doc_id"]: r["shard_id"]
        for r in token_budget_shards(df, "doc_id", "n", budget=25, bucket_size=2).collect()
    }
    # starts: 0, 10, 20, 30 -> shards 0, 0, 0, 1
    assert out == {1: 0, 2: 0, 3: 0, 4: 1}


def test_no_global_window_on_corpus(spark):
    import re

    df = spark.createDataFrame([(i, 1) for i in range(100)], "doc_id long, n long")
    plan = (
        with_global_running_total(df, "doc_id", "n")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # A no-partition window over the corpus would render as
    # windowspecdefinition(doc_id#N ASC ...) — the order column first.
    # The corpus-side window must lead with the __bucket partition key;
    # the only permitted no-partition window is over the bucket totals
    # (leads with __bucket as its ORDER key).
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs, plan
    assert all(s == "__bucket" for s in specs), specs
