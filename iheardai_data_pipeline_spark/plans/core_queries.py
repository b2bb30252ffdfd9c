"""Core query registrations (Phase 1: the flagship A1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from iheardai_data_pipeline_spark.operators.sessionize import SESSION_KPIS_ORACLE, session_kpis
from iheardai_data_pipeline_spark.plans.catalog import register
from iheardai_data_pipeline_spark.sources.batch import load_table


@register(
    "a1_session_kpis",
    oracle=SESSION_KPIS_ORACLE,
    tags=("aggregate", "sessionization", "flagship"),
    doc="A1 per-session KPI rollup via 30-min gap sessionization over events "
    "(reference enhanced_kpi_consumer.py:560-609).",
)
def a1_session_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_kpis(load_table(spark, sf_dir, "events"))
