"""Upsert / merge / dedup semantics (SURVEY.md §2.10 M1-M5).

The reference's mutation surface is PostgreSQL ``ON CONFLICT DO UPDATE``
(enhanced_kpi_consumer.py:395-434, 472-536) and a per-session monotonic
``seq`` guard (enhanced_kpi_consumer.py:643-646). On parquet-backed Spark
the equivalent is a deterministic dedup-on-read convention:
last-writer-wins by key via ``row_number`` over an ordering column —
exactly what a Delta MERGE would materialize.

Scale posture: one shuffle on the key columns (the window partition);
at 100 TB pre-bucketing the fact table by the merge key makes this
shuffle-free. No driver-side state, no collects.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def last_write_wins(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """M1/M2: keep the newest row per key.

    ``order_cols`` are sorted DESC (latest first); include a unique
    tiebreaker last for determinism.
    """
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """M3: apply an updates batch to a target snapshot, last-writer-wins.

    Equivalent to Delta ``MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED
    INSERT`` with update-priority; expressed as union + window dedup so it
    is parquet-safe and oracle-checkable.
    """
    tagged_t = target.withColumn("__prio", F.lit(0))
    tagged_u = updates.withColumn("__prio", F.lit(1))
    merged = tagged_t.unionByName(tagged_u)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("__prio").desc(), *[F.col(c).desc() for c in order_cols]
    )
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__prio")
    )


def seq_guard_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
) -> DataFrame:
    """M4/W3: keep only the max-seq row per key (monotonic seq guard —
    stale updates with seq <= current are dropped)."""
    return last_write_wins(df, key_cols, [seq_col])


def dedup_by_event_id(df: DataFrame, id_col: str = "event_id") -> DataFrame:
    """M5: event-level exact dedup by id (reference enable_deduplication,
    config/config.yaml:260). Batch analog of streaming
    ``dropDuplicates`` within watermark."""
    return df.dropDuplicates([id_col])
