"""Validation predicates + quarantine split (SURVEY.md §2.3 F1-F5).

The reference raises/drops per record (base_transformer.py:34-41,
frontend_events_extractor.py:48-57); relationally this is a predicate
split: one pass marks validity, two cheap filters produce the valid and
quarantine DataFrames. Catalyst pushes the predicate into the scan for
the valid branch; the quarantine side is the anti-split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def required_fields_predicate(df: DataFrame, fields: tuple[str, ...]) -> Column:
    """F1: all required fields present & non-null."""
    pred = F.lit(True)
    for f in fields:
        pred = pred & F.col(f).isNotNull()
    return pred


def enum_predicate(col: str, allowed: tuple[str, ...]) -> Column:
    """F2: value within the declared domain."""
    return F.col(col).isin(*allowed)


def split_valid(
    df: DataFrame, predicate: Column
) -> tuple[DataFrame, DataFrame]:
    """Split into (valid, quarantine). Both are lazy filters over the same
    scan; no shuffle."""
    return df.filter(predicate), df.filter(~F.coalesce(predicate, F.lit(False)))


def batch_error_rate_guard(
    valid: DataFrame, quarantine: DataFrame, threshold: float = 0.5
) -> float:
    """F5: error-rate circuit breaker (enhanced_kpi_consumer.py:303-307).

    Returns the failure ratio; raises if above threshold (>50% of batch
    failed aborts the trigger in the reference). Meant for foreachBatch.
    """
    n_bad = quarantine.count()
    n_ok = valid.count()
    total = n_bad + n_ok
    rate = (n_bad / total) if total else 0.0
    if total and rate > threshold:
        raise RuntimeError(
            f"batch error-rate {rate:.1%} exceeds threshold {threshold:.0%}"
        )
    return rate
