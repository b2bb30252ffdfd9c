"""Plan-shape regression tests pinning the scale claims in docs/SCALE.md.

These assert the *physical* properties the 100 TB posture depends on —
filters reaching the parquet scan, column pruning, bounded exchange
counts, broadcastable build sides — so a refactor that silently
de-optimizes a plan fails CI, not the cluster.
"""

from __future__ import annotations

import pytest

from iheardai_data_pipeline_spark.plans.catalog import CATALOG, _ensure_loaded

_ensure_loaded()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _executed(df) -> str:
    df.collect()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_push_to_scan(spark, sf_dir):
    plan = _formatted(CATALOG["q6_forecast_revenue"].fn(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    # column pruning: untouched wide columns never reach the scan schema
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "l_comment" not in read_schema and "l_returnflag" not in read_schema


def test_a1_two_exchanges_and_props_pruned(spark, sf_dir):
    df = CATALOG["a1_session_kpis"].fn(spark, sf_dir)
    plan = _formatted(df)
    # sessionization window shuffle + final sort; group-by reuses the
    # window's hash partitioning (subset-key satisfaction), no Expand
    # formatted output names each node twice (tree + detail): count
    # the "(n) Exchange" detail headers only
    assert plan.count(") Exchange") <= 2
    assert "Expand" not in plan
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "props" not in read_schema


def test_q3_broadcasts_selective_dim(spark, sf_dir):
    plan = _executed(CATALOG["q3_shipping_priority"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_x_text_quality_zero_exchanges(spark, sf_dir):
    plan = _formatted(CATALOG["x_text_quality"].fn(spark, sf_dir))
    assert "Exchange" not in plan


@pytest.mark.parametrize("name", ["q4_order_priority", "q18_large_volume_customers"])
def test_semi_join_planned(spark, sf_dir, name):
    plan = _formatted(CATALOG[name].fn(spark, sf_dir))
    assert "LeftSemi" in plan


def test_ivf_assignment_is_narrow(spark, sf_dir):
    """IVF centroid assignment must stay a shuffle-free map — no
    crossJoin row explosion, no per-id window exchange."""
    from iheardai_data_pipeline_spark.operators.similarity import ivf_assign
    from iheardai_data_pipeline_spark.sources.batch import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    _, assigned = ivf_assign(emb, n_centroids=8)
    plan = _formatted(assigned)
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "Join" not in plan
