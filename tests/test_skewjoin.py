"""Salted-join operator: result equivalence + salt distribution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.operators.skewjoin import salted_join


def _hot_key_frames(spark):
    # one hot key (90% of rows) + a long tail; small dim with a miss
    rows = [(1, i, i * 10.0) for i in range(90)] + [
        (k, k, 1.0) for k in range(2, 12)
    ]
    large = spark.createDataFrame(rows, "k long, row_id long, v double")
    small = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (99, "nomatch")], "k long, name string"
    )
    return large, small


def test_salted_inner_equals_plain_join(spark):
    large, small = _hot_key_frames(spark)
    got = sorted(
        map(tuple, salted_join(large, small, "k", salt_on="row_id", n_salts=4).collect())
    )
    want = sorted(map(tuple, large.join(small, "k").collect()))
    assert got == want and len(want) == 92


def test_salted_left_keeps_unmatched_rows(spark):
    large, small = _hot_key_frames(spark)
    got = sorted(
        map(
            tuple,
            salted_join(large, small, "k", salt_on="row_id", n_salts=4, how="left").collect(),
        )
    )
    want = sorted(map(tuple, large.join(small, "k", "left").collect()))
    assert got == want and len(want) == 100


def test_hot_key_scatters_across_salts(spark):
    large, _ = _hot_key_frames(spark)
    salted = large.withColumn(
        "salt", F.pmod(F.xxhash64(F.col("row_id")), F.lit(4)).cast("int")
    )
    n_salts_hit = salted.filter("k = 1").select("salt").distinct().count()
    assert n_salts_hit == 4  # the hot key no longer lands on one reducer


def test_unsupported_how_raises(spark):
    large, small = _hot_key_frames(spark)
    with pytest.raises(ValueError):
        salted_join(large, small, "k", salt_on="row_id", how="full")
