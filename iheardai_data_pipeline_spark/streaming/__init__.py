"""Structured Streaming layer (SURVEY.md §2.11 T1-T8, §3.2).

The reference's Kafka micro-batch consumer loop (poll -> transform ->
upsert -> commit, enhanced_kpi_consumer.py:309-351) maps to:

- readers: Kafka / file readStream wrappers with the declared schemas
- windows: tumbling usage (T3), session windows (T4), watermark dedup (T5)
- sinks: partitioned parquet archive (T7/K7), foreachBatch incremental
  session-KPI maintenance (§3.2 step 3), session-state table (J4/K5)

The same transform library (functions/*) runs unchanged under
foreachBatch — they are plain DataFrame -> DataFrame functions.
"""

from iheardai_data_pipeline_spark.streaming import readers, sinks, windows  # noqa: F401
