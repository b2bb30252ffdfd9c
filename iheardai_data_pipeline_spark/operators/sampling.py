"""Deterministic sampling and sharding for training-data exports.

A 100 TB corpus pipeline needs samples and shards that are
*reproducible* (same rows on every run, on any cluster, resumable after
partial failure) and *cheap* (a narrow filter the scan can evaluate —
no global shuffle, no RNG state). Both properties come from keying the
decision on a cryptographic digest of the row's stable id:

    bucket(id) = int(hex(md5(id)[:8]))  in [0, 2^32)

- sample: keep rows with ``bucket % denom < num`` — an exact-rate,
  stable subset; enlarging the rate keeps previously sampled rows
  (nested samples: 1% subset of the 10% sample).
- shard: ``bucket % n_shards`` — uniform, stable shard assignment for
  parallel export/training, independent of input partitioning.

md5 (not xxhash) on purpose: it is bit-identical across Spark, DuckDB,
Python and every warehouse, so the sample definition is portable and
oracle-checkable — sampling decisions outlive the engine that made them.

Reference scope note: the reference has no sampling surface (SURVEY §2);
this is part of the training-data extension set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col: Column | str) -> Column:
    """Stable 32-bit bucket from the md5 of the stringified id."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("bigint")


def deterministic_sample(
    df: DataFrame, id_col: str, num: int, denom: int = 100
) -> DataFrame:
    """Keep the stable num/denom fraction of rows keyed on ``id_col``."""
    return df.filter(hash_bucket(id_col) % denom < num)


def assign_shards(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Add a stable ``shard`` column in [0, n_shards)."""
    return df.withColumn("shard", hash_bucket(id_col) % n_shards)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, tuple[int, int]],
    default_rate: tuple[int, int] | None = None,
) -> DataFrame:
    """Per-stratum deterministic sampling: ``rates`` maps stratum value
    -> (num, denom); strata absent from the map keep ``default_rate``
    (None = dropped entirely).

    The training-data rebalance primitive (e.g. downsample the dominant
    language, keep the tail whole). Same md5 keying as
    ``deterministic_sample``, so per-stratum subsets stay nested and
    portable; still a pure narrow filter — the stratum column rides the
    scan, no shuffle.
    """
    bucket = hash_bucket(id_col)
    strat = F.col(stratum_col)
    keep = F.lit(False) if default_rate is None else (
        bucket % default_rate[1] < default_rate[0]
    )
    for value, (num, denom) in sorted(rates.items()):
        keep = F.when(strat == value, bucket % denom < num).otherwise(keep)
    return df.filter(keep)
