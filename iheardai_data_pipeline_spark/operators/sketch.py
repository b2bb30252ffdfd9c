"""Count-Min sketch operators (DataFrame-native, engine-portable).

Spark ships ``count_min_sketch`` as an opaque binary aggregate with no
SQL-side query path, so this module implements the sketch as PLAIN
relational state instead: the sketch IS a (depth, cell) -> count table
of d*w rows. That buys three things at 100 TB:

- bounded state: d*w cells regardless of input size, and the build is
  one partial-agg groupBy — cell counts combine map-side, exactly the
  mergeability property CMS exists for;
- queryability: point estimates are a join + min, no binary decoding;
- portability: cells are md5-derived (the repo's cross-engine hash
  discipline), so a DuckDB oracle reproduces every counter exactly —
  the sketch is value-oracle-checkable, not just bounds-checkable.

Estimates carry the standard CMS guarantee: est >= true count always
(hash collisions only ever ADD), and est <= true + eps*N with
probability 1-delta for w = ceil(e/eps), d = ceil(ln(1/delta)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism


def _cell(depth: Column, key: Column, width: int) -> Column:
    """Row-local CMS cell index for one hash row: md5(depth ':' key)
    first 8 hex chars -> uint32 -> % width. md5 keeps the oracle
    bit-identical in any engine (xxhash64 is Spark-only)."""
    h = F.md5(F.concat(depth.cast("string"), F.lit(":"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Build the sketch: (depth, cell, cnt) with d*w bounded rows.

    Each input row lands in one cell per hash row (an exploded d-wide
    struct array, row-local); the count is ONE partial-agg groupBy on
    (depth, cell) — hot cells reduce map-side, and the reduced state is
    at most d*w rows per partition, so the shuffle is O(d*w*partitions)
    no matter how many input rows streamed through.
    """
    cells = ensure_parallelism(df).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("depth"),
                    _cell(i, F.col(key_col), width).alias("cell"),
                ),
            )
        ).alias("dc")
    )
    return (
        cells.select("dc.depth", "dc.cell")
        .groupBy("depth", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point estimates for a key set: min over the d cells a key hashes
    to. The sketch side is d*w rows — broadcastable at any corpus size;
    absent cells count 0 (key never seen)."""
    probes = keys.select(F.col(key_col)).distinct().select(
        key_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("depth"),
                    _cell(i, F.col(key_col), width).alias("cell"),
                ),
            )
        ).alias("dc"),
    ).select(key_col, "dc.depth", "dc.cell")
    return (
        probes.join(F.broadcast(sketch), ["depth", "cell"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
