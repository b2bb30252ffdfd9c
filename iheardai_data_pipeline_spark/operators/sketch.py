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


# --- Bloom filter (round 5) -------------------------------------------------------


def _bloom_bit(i: Column, key: Column, m: int) -> Column:
    """Row-local Bloom bit index for hash row ``i`` — same md5-portable
    discipline as the CMS cell, so a DuckDB oracle reproduces every set
    bit exactly."""
    h = F.md5(F.concat(i.cast("string"), F.lit(":"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m


def bloom_build(df: DataFrame, key_col: str, m: int = 4096, k: int = 6) -> DataFrame:
    """Build a Bloom filter as RELATIONAL state: the distinct set-bit
    rows ``(bit)`` — at most ``m`` rows regardless of input size.

    Spark's native ``bloom_filter_agg`` is an opaque binary with no
    SQL-side membership path; the relational form is mergeable (union +
    distinct — the same partial-agg mergeability as the CMS cells),
    broadcastable, and value-oracle-checkable bit for bit. The packed
    64x-denser bitmap is a trivial fold of this relation
    (:func:`bloom_pack_words`) when raw memory matters.
    """
    bits = ensure_parallelism(df).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda i: _bloom_bit(i, F.col(key_col), m),
            )
        ).alias("bit")
    )
    return bits.distinct()


def bloom_probe(
    bloom: DataFrame,
    keys: DataFrame,
    key_col: str,
    m: int = 4096,
    k: int = 6,
) -> DataFrame:
    """(key, maybe_present): TRUE iff all ``k`` of the key's bits are
    set. Bloom's contract: NO false negatives (a member always probes
    TRUE); false positives at the standard (1 - e^(-kn/m))^k rate. The
    filter side is <= m rows — broadcast; probing is one join + count.
    """
    probes = (
        keys.select(F.col(key_col))
        .distinct()
        .select(
            key_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(k - 1)),
                    lambda i: _bloom_bit(i, F.col(key_col), m),
                )
            ).alias("bit"),
        )
    )
    return (
        probes.join(F.broadcast(bloom.withColumn("__set", F.lit(1))), "bit", "left")
        .groupBy(key_col)
        .agg((F.count(F.lit(1)) == F.sum(F.coalesce("__set", F.lit(0)))).alias(
            "maybe_present"
        ))
    )


def bloom_pack_words(bloom: DataFrame, m: int = 4096) -> DataFrame:
    """The dense bitmap form: (word_idx, word) with m/64 BIGINT words —
    what a serving layer ships. SUM equals the bitwise OR because the
    input bits are distinct (each power of two contributes once); bit
    63's shift lands on min-long, the correct two's-complement pattern,
    and no partial sum can overflow (positives cap at 2^63 - 1 before
    the single negative contribution joins).
    """
    contrib = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(bit, 64) AS INT))")
    return (
        bloom.select(
            F.expr("CAST(bit div 64 AS BIGINT)").alias("word_idx"),
            contrib.alias("c"),
        )
        .groupBy("word_idx")
        .agg(F.sum("c").cast("long").alias("word"))
    )


# --- HyperLogLog (round 5) --------------------------------------------------------


def _hll_parts(key: Column, p: int) -> tuple[Column, Column]:
    """(bucket, rank) for one key — md5-portable: bucket from the first
    8 hex chars, rank = leading zeros of the SECOND 8-hex uint32 + 1
    (33 when that word is zero). Leading zeros are computed EXACTLY via
    the binary-string length (no float log): lz = 32 - len(bin(v))."""
    h1 = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    v = F.conv(F.substring(F.md5(key.cast("string")), 9, 8), 16, 10).cast("long")
    bucket = F.pmod(h1, F.lit(1 << p))
    rank = F.when(v > 0, F.lit(33) - F.length(F.conv(v, 10, 2))).otherwise(
        F.lit(33)
    )
    return bucket, rank


def hll_registers(df: DataFrame, key_col: str, p: int = 6) -> DataFrame:
    """The HLL state as PLAIN relational rows: (bucket, max_rank), at
    most 2^p of them — mergeable by max (the partial-agg combine IS the
    sketch merge), broadcastable, and md5-portable so a DuckDB oracle
    reproduces every register exactly. The same design trade as the CMS
    cells and Bloom bits: Spark's approx_count_distinct is an opaque
    binary; this one is queryable and value-oracle-checkable."""
    bucket, rank = _hll_parts(F.col(key_col), p)
    return (
        ensure_parallelism(df)
        .where(F.col(key_col).isNotNull())
        .select(bucket.alias("bucket"), rank.alias("rank"))
        .groupBy("bucket")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_estimate(p: int = 6, over=None) -> Column:
    """The raw HLL estimate as an AGGREGATE Column over a register
    relation (use inside ``registers.agg(...)``):
    alpha * m^2 / sum(2^-M_j).

    The harmonic sum is EXACT integer arithmetic: ranks are <= 33, so
    2^-M_j scaled by 2^33 is the integer 2^(33 - M_j); unobserved
    buckets contribute rank 0 = 2^33 each. One double division at the
    end — order-independent, so the estimate is bit-identical across
    engines (the repo's exact-integer-then-one-division discipline).
    Small-range linear counting is deliberately NOT applied: it needs
    ln(), whose last-ulp behavior is libm-specific — callers wanting it
    apply their own correction downstream.

    ``over``: a Window spec — the same arithmetic as a WINDOW over the
    register rows instead of a collapsing aggregate, so a caller that
    wants (register, estimate) rows computes the registers ONCE (an
    ``agg`` + crossJoin-back re-evaluates the register subtree twice).
    """
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))

    def _a(c: Column) -> Column:
        return c.over(over) if over is not None else c

    s_obs = _a(
        F.sum(F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 33 - max_rank) AS BIGINT)"))
    )
    n_obs = _a(F.count(F.lit(1)))
    scaled = s_obs + (F.lit(m).cast("long") - n_obs) * F.lit(1 << 33).cast("long")
    return (F.lit(alpha * m * m) * F.lit(float(1 << 33)) / scaled.cast("double"))


# --- DDSketch-style log-bucket quantile sketch --------------------------------------


def ddq_build(df: DataFrame, col: str, scale: int = 100) -> DataFrame:
    """Mergeable QUANTILE sketch as plain relational rows: (e, m, cnt),
    bounded at ~4*64 buckets however many rows stream through — the
    quantile member of the repo's relational-sketch family (CMS cells,
    HLL registers, Bloom bits; DDSketch lineage: Masson et al. 2019,
    "DDSketch: a fast and fully-mergeable quantile sketch").

    Bucketing is EXACT INTEGER arithmetic shared bit-for-bit with the
    DuckDB twin: values scale to integer units of 1/``scale`` through a
    DECIMAL(18, log10(scale)) cast (order-independent, no float
    rounding; ``scale`` must be a power of ten so the decimal cast is
    exact — pass the same value to :func:`ddq_quantiles` so the
    read-off divides back on the same grid), and a positive v lands in
    bucket ``e = floor(log2 v)`` (the length of ``bin(v)`` minus one —
    a string length, no libm log) with 2 extra mantissa bits
    ``m ∈ [0,4)`` read straight off the binary string's 2nd/3rd chars
    (4 linear sub-buckets per octave → relative error <= 1/8 at the
    bucket midpoint, <= 1/4 at the lower bound reported here).
    Non-positive values take the dedicated (e=-1, m=0) bucket whose
    lower bound is 0. Merge = SUM of cnt per (e, m) — the same
    partial-agg mergeability as the CMS, so the streaming twin (t17)
    sum-merges micro-batches exactly (epoch-guarded, like t15).
    """
    digits = len(str(scale)) - 1
    if scale <= 0 or 10**digits != scale:
        raise ValueError(f"scale must be a power of ten, got {scale}")
    v = F.round(F.col(col).cast(f"decimal(18,{digits})") * scale).cast("long")
    b = F.bin(v)
    ln = F.length(b)
    e = F.when(v <= 0, F.lit(-1)).otherwise((ln - 1).cast("int"))
    # guard the casts: substring('' ) -> '' would throw under ANSI
    b2 = F.when(ln >= 2, F.substring(b, 2, 1)).otherwise(F.lit("0")).cast("int")
    b3 = F.when(ln >= 3, F.substring(b, 3, 1)).otherwise(F.lit("0")).cast("int")
    m = (
        F.when(v <= 0, F.lit(0))
        .when(ln >= 3, 2 * b2 + b3)
        .when(ln == 2, b2)
        .otherwise(F.lit(0))
        .cast("int")
    )
    return (
        ensure_parallelism(df.where(F.col(col).isNotNull()))
        .select(e.alias("e"), m.alias("m"))
        .groupBy("e", "m")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ddq_lower_bound_cents() -> Column:
    """Deterministic representative of bucket (e, m): its LOWER bound in
    integer cents. ``(4+m) * 2^(e-2)`` for e >= 2 — powers of two and a
    3-significant-bit multiplier are exactly representable, so the
    double pow is exact and the cast back to BIGINT is lossless."""
    return (
        F.when(F.col("e") < 0, F.lit(0))
        .when(F.col("e") == 0, F.lit(1))
        .when(F.col("e") == 1, F.lit(2) + F.col("m"))
        .otherwise(
            (
                (F.lit(4) + F.col("m")).cast("double")
                * F.pow(F.lit(2.0), (F.col("e") - 2).cast("double"))
            ).cast("long")
        )
        .cast("long")
    )


def ddq_quantiles(
    sketch: DataFrame, qs: tuple = (0.5, 0.9, 0.99), scale: int = 100
) -> DataFrame:
    """(q, n, est_cents, est): rank-based quantile read-off — the first
    bucket (in (e, m) order) whose cumulative count reaches
    ``ceil(q * n)``, reported at its lower bound. The sketch side is
    <= ~256 rows, so the single-partition cumulative window and the
    tiny cross join are free; every output value is exact integer
    arithmetic plus ONE double division (est = est_cents / scale)."""
    from pyspark.sql import Window

    w = Window.orderBy("e", "m").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        "e",
        "m",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
        ddq_lower_bound_cents().alias("lb"),
    )
    qdf = sketch.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    hit = (
        qdf.crossJoin(cum)
        .where(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("q")
        .agg(
            F.min(F.struct("e", "m", "n", "lb")).alias("s"),
        )
    )
    return hit.select(
        "q",
        F.col("s.n").alias("n"),
        F.col("s.lb").alias("est_cents"),
        (F.col("s.lb") / F.lit(float(scale))).alias("est"),
    ).orderBy("q")


def hll_registers_grouped(
    df: DataFrame, key_col: str, group_cols: list[str], p: int = 6
) -> DataFrame:
    """Per-GROUP HLL registers: (group..., bucket, max_rank) — the
    sketch-powered "distinct per dimension" rollup (distinct users per
    event type / date / segment). State is <= 2^p rows PER GROUP and
    merges by max exactly like the global sketch, so dimensional
    rollups of distinct counts stream/partial-agg at any scale where an
    exact count-distinct would shuffle every key. Estimate per group by
    ``regs.groupBy(*group_cols).agg(hll_estimate(p))``."""
    bucket, rank = _hll_parts(F.col(key_col), p)
    return (
        ensure_parallelism(df)
        .select(*group_cols, bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("max_rank"))
    )
