"""iheardai_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference streaming ETL/analytics pipeline
(``SankaiAI/iheardai-data-pipeline``): enveloped-event data model, the
scalar transform library, sessionization / rollup / funnel / journey
aggregates, upsert & dedup semantics, and Structured-Streaming analogs of
the reference's Kafka micro-batch loop — plus large-scale training-data
operators (dedup families, similarity search, text analysis).

Design stance (SURVEY.md §7): a small library of pure
``DataFrame -> DataFrame`` functions + a declared ``StructType`` registry.
Everything is expressed against the DataFrame/SQL API so Catalyst plans
the physical execution; Python UDFs appear only where column expressions
genuinely cannot express the semantics, and then always Arrow-vectorized.
"""

__version__ = "0.1.0"

from iheardai_data_pipeline_spark.session import get_spark  # noqa: F401

def list_queries() -> dict[str, str]:
    """Name -> one-line description of every declared catalog query."""
    from iheardai_data_pipeline_spark.plans.catalog import CATALOG, _ensure_loaded

    _ensure_loaded()
    return {name: spec.doc for name, spec in sorted(CATALOG.items())}


def run_query(name: str, spark=None, sf_dir: str = "/root/testdata/sf0.01"):
    """Execute a catalog query by name; returns its DataFrame."""
    from iheardai_data_pipeline_spark.plans.catalog import CATALOG, _ensure_loaded

    _ensure_loaded()
    if spark is None:
        spark = get_spark()
    return CATALOG[name].fn(spark, sf_dir)
