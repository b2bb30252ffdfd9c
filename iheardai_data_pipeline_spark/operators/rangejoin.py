"""Interval / range join — like the as-of join (operators/asof.py), an
operator Spark's API only expresses as a theta-join, rebuilt as a
composition that scales.

Semantics: pair every left row with the right rows sharing its key whose
timestamp falls in ``[left_ts + lower, left_ts + upper]``.

Scale design — Spark plans the naive ``l.key = r.key AND r.ts BETWEEN …``
as a sort-merge join whose per-key candidate space is quadratic, or (no
equi-key) a broadcast-nested-loop. Instead, the time axis is chunked
into fixed buckets of ``bucket_width`` seconds (default: the interval
span) — the standard time-bucketing rewrite:

1. each right row keys by its home bucket ``floor(ts / width)`` (one row,
   no replication on the big probe side);
2. each left row explodes to the buckets its interval can touch —
   ``floor((ts+lower)/width) … floor((ts+upper)/width)``, a constant
   ≤ ceil(span/width)+1 replicas;
3. equi-join on (key, bucket) + the exact residual range filter.

Cost: one shuffle per side on (key, bucket), candidate volume bounded by
rows per (key, bucket) — tunable via ``bucket_width`` — instead of rows
per key. Pairs are found exactly once because the right side keeps a
single home bucket.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    bucket_width_s: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Inner range join: right rows with ``right_ts`` within
    ``[left_ts + lower_s, left_ts + upper_s]`` (seconds, inclusive) per key.

    Right columns (except the keys) come back renamed with ``suffix``.
    """
    if upper_s < lower_s:
        raise ValueError("upper_s must be >= lower_s")
    on = list(on)
    width = float(bucket_width_s or max(upper_s - lower_s, 1e-9))

    l_sec = F.col(left_ts).cast("double")
    r_sec = F.col(right_ts).cast("double")

    l_buckets = F.sequence(
        F.floor((l_sec + F.lit(lower_s)) / F.lit(width)),
        F.floor((l_sec + F.lit(upper_s)) / F.lit(width)),
    )
    lhs = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        *[F.col(c) for c in on],
        l_sec.alias("__lsec"),
        F.explode(l_buckets).alias("__bucket"),
    )
    right_payload = [c for c in right.columns if c not in on]
    rhs = right.select(
        *[F.col(c) for c in on],
        r_sec.alias("__rsec"),
        F.floor(r_sec / F.lit(width)).alias("__bucket"),
        F.struct(*[F.col(c) for c in right_payload]).alias("__r"),
    )
    joined = lhs.join(rhs, [*on, "__bucket"]).filter(
        (F.col("__rsec") >= F.col("__lsec") + F.lit(lower_s))
        & (F.col("__rsec") <= F.col("__lsec") + F.lit(upper_s))
    )
    return joined.select(
        *[F.col("__l")[c].alias(c) for c in left.columns if c not in on],
        *[F.col(c) for c in on],
        *[F.col("__r")[c].alias(f"{c}{suffix}") for c in right_payload],
    )
