"""As-of join operator: backward/forward directions, ties, no-match."""

from __future__ import annotations

import datetime as dt

from iheardai_data_pipeline_spark.operators.asof import asof_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10), "l-early"),   # before any right row -> no match
            (1, _ts(30), "l-mid"),     # matches r@20
            (1, _ts(40), "l-tie"),     # right row at the same ts matches (<=)
            (2, _ts(30), "l-other"),   # other key: matches r@25 not key 1's rows
            (3, _ts(30), "l-nokey"),   # key absent from right -> no match
        ],
        "k bigint, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(20), 200.0),
            (1, _ts(40), 400.0),
            (1, _ts(50), 500.0),
            (2, _ts(25), 250.0),
        ],
        "k bigint, ts timestamp, amount double",
    )
    return left, right


def test_asof_backward(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts")
    got = {r["name"]: (r["amount_asof"], r["ts_asof"]) for r in out.collect()}
    assert got["l-early"] == (None, None)
    assert got["l-mid"] == (200.0, _ts(20))
    assert got["l-tie"] == (400.0, _ts(40))
    assert got["l-other"] == (250.0, _ts(25))
    assert got["l-nokey"] == (None, None)
    assert out.count() == left.count()


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", direction="forward"
    )
    got = {r["name"]: r["amount_asof"] for r in out.collect()}
    assert got["l-early"] == 200.0   # earliest right at-or-after 10
    assert got["l-mid"] == 400.0
    assert got["l-tie"] == 400.0     # same-ts right matches (>=)
    assert got["l-other"] is None    # no right row at-or-after 30 for key 2
    assert got["l-nokey"] is None


def test_asof_single_shuffle_plan(spark):
    """The whole as-of is one keyed exchange + window — no join node."""
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning(k") == 1
