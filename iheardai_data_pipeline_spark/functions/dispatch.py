"""Transformer factory + event-type routing (P45-P47).

Reference: etl/transform/__init__.py:25-48 (factory),
enhanced_kpi_consumer.py:103-112 (substring router),
snowflake_loader.py:173-197 (flatten + topic->table map).

In the engine a "transformer" is a ``DataFrame -> DataFrame`` function;
routing a mixed stream is a filter-split (one branch per source), which
Catalyst collapses into a single scan with three filters.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.functions.frontend import transform_frontend_events
from iheardai_data_pipeline_spark.functions.marketo import (
    transform_marketo_activities,
    transform_marketo_leads,
)
from iheardai_data_pipeline_spark.functions.text_agent import transform_text_agent_turns

TRANSFORMERS: dict[str, Callable[[DataFrame], DataFrame]] = {
    "marketo": transform_marketo_leads,
    "marketo_activity": transform_marketo_activities,
    "frontend": transform_frontend_events,
    "text_agent": transform_text_agent_turns,
}


def get_transformer(source: str) -> Callable[[DataFrame], DataFrame]:
    """P45: factory semantics of etl/transform/__init__.py:25-48."""
    try:
        return TRANSFORMERS[source]
    except KeyError:
        raise ValueError(
            f"unknown transformer source {source!r}; expected one of {sorted(TRANSFORMERS)}"
        ) from None


def route_by_event_type(df: DataFrame, type_col: str = "event_type") -> dict[str, DataFrame]:
    """P46: substring router (enhanced_kpi_consumer.py:103-112) as a
    filter-split of one stream into per-source branches."""
    et = F.coalesce(F.col(type_col), F.lit(""))
    return {
        "marketo": df.filter(et.contains("marketo") & ~et.contains("activity")),
        "marketo_activity": df.filter(et.contains("marketo") & et.contains("activity")),
        "frontend": df.filter(et.contains("frontend") | et.contains("interaction")),
        "text_agent": df.filter(et.contains("text_agent") | et.contains("turn")),
    }


def flatten_envelope(df: DataFrame) -> DataFrame:
    """P47: envelope -> flat columns + metadata JSON string
    (snowflake_loader.py:173-188)."""
    return df.select(
        F.col("event_id"),
        F.col("event_type"),
        F.col("source"),
        F.col("ts_ms"),
        F.col("data.*"),
        F.to_json(F.col("metadata")).alias("metadata_json"),
    )
