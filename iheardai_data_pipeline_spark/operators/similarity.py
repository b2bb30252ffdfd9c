"""Similarity search over embedding columns (north-star set).

- brute-force cosine top-k: the correctness baseline — one scan, a
  64-wide fused fold per row, a k-row sort. At 100 TB this is the
  per-partition kernel, not the global algorithm.
- IVF top-k: the scale path — deterministic centroids, vectors
  partitioned by nearest centroid, queries probe the nprobe nearest
  lists: the candidate scan shrinks by ~C/nprobe while recall stays
  high for clustered data.
- embedding near-dup pairs: cosine >= threshold within a blocking key
  (label/shard) — the embedding analog of n-gram dedup blocking.

All arithmetic is double-precision JVM expressions (zip_with/aggregate);
no UDFs, no driver-side loops over rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism, eval_once


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<numeric> columns (double)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


# public names for composing with precomputed norms
dot_product = _dot
vector_norm = _norm


def vector_literal(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    The query norm is folded driver-side once (same left-to-right fold as
    the JVM expression, so the value is bit-identical) instead of being
    re-evaluated per row.
    """
    import math

    q = vector_literal(query_vec)
    qnorm = math.sqrt(sum((float(x) * float(x) for x in query_vec), 0.0))
    sim = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qnorm))
    df = embeddings
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    return (
        df.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), id_col)
        .limit(k)
        .select(id_col, F.round(F.col("sim"), 6).alias("sim"))
    )


def embedding_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt_buckets: int = 8,
) -> DataFrame:
    """Near-duplicate embedding pairs: cosine >= threshold within a
    blocking key (equi-join on the block column — never a cross join).

    Two skew/efficiency guards for the within-block quadratic work:
    - norms are computed once per vector BEFORE the join (not per pair),
      cutting the fold work per pair from 3 array passes to 1;
    - the left side is salted and the right side replicated across
      ``salt_buckets``, so a block's pair-space splits into
      blocks x buckets tasks instead of one task per block (a handful of
      hot blocks would otherwise serialize the whole join).
    """
    withnorm = embeddings.select(
        F.col(block_col), F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("nrm")
    )
    # the PAIR work is quadratic in block size while the probe-side scan
    # is input-sized: when the right side broadcasts (rig-scale blocks),
    # a single-split scan would serialize the whole pair space on one
    # core (measured 2.4s/1 task under x_graph_coreness) — fan the probe
    # side to cluster parallelism first; at 100 TB the scan carries
    # thousands of splits and this short-circuits (guide §2.5 input skew)
    left = ensure_parallelism(withnorm).select(
        F.col(block_col),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        F.col("nrm").alias("norm_a"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets)).alias("salt"),
    )
    right = withnorm.select(
        F.col(block_col),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        F.col("nrm").alias("norm_b"),
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<bigint>")).alias(
            "salt"
        ),
    )
    sim = _dot(F.col("vec_a"), F.col("vec_b")) / (F.col("norm_a") * F.col("norm_b"))
    return (
        left.join(right, [block_col, "salt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select(block_col, "id_a", "id_b", F.round("sim", 6).alias("sim"))
    )


def resolve_n_centroids(embeddings: DataFrame, n_centroids: int | None) -> int:
    """``None`` -> the sqrt(N) rule of thumb (clamped to [16, 65536]):
    balanced IVF lists hold ~sqrt(N) vectors each, so probe work and
    list count grow together as the corpus grows — the standard sizing
    for IVF indexes. Costs one count() when invoked."""
    if n_centroids is not None:
        return n_centroids
    import math

    n = embeddings.count()
    return max(16, min(65536, int(math.isqrt(max(n, 1)))))


def _collect_centroids(
    embeddings: DataFrame,
    n_centroids: int,
    id_col: str,
    vec_col: str,
    seed_mode: str = "first",
) -> list[tuple[int, list[float]]]:
    """Deterministic seed centroids; bounded collect (n_centroids rows)
    — the index-build analog of collecting a broadcast side.

    ``seed_mode``:
    - "first": the first n_centroids vectors by id — the original
      rig-scale contract (the SQL oracles replicate it bit-for-bit).
    - "hash": the n_centroids smallest xxhash64(id) — a deterministic
      uniform sample across the whole corpus, the scalable-seeding
      choice (first-by-id seeds degenerate when ids correlate with
      content, e.g. crawl order); the TakeOrdered is still bounded.
    Either way centroid ids are assigned in ascending source-id order.
    """
    if seed_mode == "hash":
        picked = embeddings.orderBy(
            F.xxhash64(F.col(id_col)), F.col(id_col)
        )
    elif seed_mode == "first":
        picked = embeddings.orderBy(id_col)
    else:
        raise ValueError(f"unknown seed_mode {seed_mode!r}")
    rows = picked.limit(n_centroids).select(id_col, vec_col).collect()
    rows.sort(key=lambda r: r[0])
    return [(r[0], [float(x) for x in r[1]]) for r in rows]


def _argmax_centroid_expr(cent_vecs: list[list[float]], vec_col: str) -> Column:
    """Row-local argmax-cosine centroid id as ONE scores-array expression.

    Replaces the crossJoin(x n_centroids) + row_number window the naive
    formulation needs: no row explosion, NO shuffle — assignment is a
    narrow map that scales to any corpus size. Since |v| is constant
    across a row's candidates, argmax of dot(v,c)/|c| equals argmax of
    cosine; per-centroid 1/|c| are driver-computed constants. The scores
    array is built once (each dot fold runs exactly once per centroid)
    and the argmax is a second fold OVER that array (its elements are
    scalars, so re-reference is free — unlike re-referencing the dot
    folds, which Catalyst would re-execute). Strict > keeps the first
    maximal element, so ties break to the lowest centroid id — matching
    ORDER BY csim DESC, centroid_id ASC. Null/absent vectors yield -1.
    """
    import math

    n = len(cent_vecs)
    cents = "array(" + ",".join(
        "array(" + ",".join(f"{x!r}D" for x in c) + ")" for c in cent_vecs
    ) + ")"
    invn = "array(" + ",".join(
        f"{1.0 / math.sqrt(sum(x * x for x in c))!r}D" for c in cent_vecs
    ) + ")"
    return _argmax_fold_expr(vec_col, cents, invn, n)


def _argmax_fold_expr(vec_col: str, cents_ref: str, invn_ref: str, n: int) -> Column:
    """The argmax-cosine fold itself, over ANY SQL reference to a
    k x dim centroid matrix (a literal array for small k, a broadcast
    column for large k — see _with_centroid_id)."""
    scores = f"""
        transform(sequence(0, {n - 1}), i ->
          aggregate(zip_with(`{vec_col}`, element_at({cents_ref}, i + 1),
                             (a, b) -> CAST(a AS DOUBLE) * b),
                    0.0D, (p, v) -> p + v) * element_at({invn_ref}, i + 1))
    """
    return F.expr(
        f"""
        coalesce(
          aggregate(
            {scores},
            struct(CAST(-1.0E308 AS DOUBLE) AS s, -1 AS b, 0 AS i),
            (acc, x) -> CASE WHEN x > acc.s
                THEN struct(x AS s, acc.i AS b, acc.i + 1 AS i)
                ELSE struct(acc.s AS s, acc.b AS b, acc.i + 1 AS i) END,
            acc -> acc.b),
          -1)
        """
    )


# above this many centroids the literal-matrix expression stops being a
# codegen win: the SQL text embeds k x dim double literals (64 centroids
# x 64 dims ~ 80 KB of expression), and analysis/codegen cost grows with
# it — ship the matrix as data instead
_LITERAL_ARGMAX_MAX_CENTROIDS = 64


def _with_centroid_id(
    df: DataFrame, cent_vecs: list[list[float]], vec_col: str, out_col: str
) -> DataFrame:
    """``df`` + ``out_col`` = argmax-cosine centroid id, still a NARROW
    map whatever k is. Small k inlines the centroid matrix as a literal
    expression (whole-stage-codegen friendly); large k broadcasts a
    ONE-ROW matrix relation and the same fold reads it as a column, so
    expression size is constant in k and the matrix ships once per
    executor, not once per task in the plan text. Behind an eval_once
    barrier either way: downstream re-references must not re-run the
    k x dim fold."""
    import math

    if len(cent_vecs) <= _LITERAL_ARGMAX_MAX_CENTROIDS:
        return eval_once(
            df, **{out_col: _argmax_centroid_expr(cent_vecs, vec_col)}
        )
    spark = df.sparkSession
    invn = [1.0 / math.sqrt(sum(x * x for x in c)) for c in cent_vecs]
    matrix = spark.createDataFrame(
        [([list(map(float, c)) for c in cent_vecs], invn)],
        "__cents array<array<double>>, __invn array<double>",
    )
    return eval_once(
        df.crossJoin(F.broadcast(matrix)),
        **{out_col: _argmax_fold_expr(vec_col, "__cents", "__invn", len(cent_vecs))},
    ).drop("__cents", "__invn")


def _refine_centroids(
    embeddings: DataFrame,
    cent_vecs: list[list[float]],
    vec_col: str,
    iters: int,
) -> list[list[float]]:
    """Lloyd refinement of the seed centroids, deterministically.

    Each iteration: narrow argmax assignment, then per-(centroid, dim)
    means via posexplode + groupBy — the aggregate state is k*dim cells
    regardless of corpus size, and the collect is bounded by k*dim.
    Component sums go through DECIMAL(28,16) so the mean is independent
    of partition/shuffle order (a raw double sum would make centroids —
    and thus candidate lists — vary run to run). Centroids that attract
    no vectors keep their previous position.
    """
    for _ in range(iters):
        # the argmax must land behind the eval_once generator barrier
        # (inside _with_centroid_id): projected next to posexplode it
        # would re-evaluate its k x dim fold once per EXPLODED row
        # (x dim slowdown — measured 7.5s/iter vs 0.5s at sf0.1)
        base = _with_centroid_id(
            embeddings.select(vec_col), cent_vecs, vec_col, "__cid"
        )
        assigned = base.select(
            F.col("__cid").alias("centroid_id"),
            F.posexplode(F.col(vec_col)).alias("pos", "x"),
        )
        cells = (
            assigned.groupBy("centroid_id", "pos")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(28,16)"))
                    / F.count(F.lit(1))
                )
                .cast("double")
                .alias("m")
            )
            .collect()
        )
        new_vecs = [list(v) for v in cent_vecs]
        for row in cells:
            cid = row["centroid_id"]
            if 0 <= cid < len(new_vecs):
                new_vecs[cid][row["pos"]] = row["m"]
        cent_vecs = new_vecs
    return cent_vecs


def ivf_assign(
    embeddings: DataFrame,
    n_centroids: int | None = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
    seed_mode: str = "first",
) -> tuple[DataFrame, DataFrame]:
    """IVF index build: deterministic seed centroids (``seed_mode``:
    "first" n by id, or "hash" — a uniform xxhash64 sample, the
    scalable choice; see _collect_centroids), every vector assigned to
    its max-cosine centroid. Returns (centroids, assigned).
    ``n_centroids=None`` applies the sqrt(N) sizing rule
    (resolve_n_centroids).

    Assignment is a NARROW map (see _with_centroid_id) — the naive
    crossJoin + per-id window would shuffle the whole corpus on vec_id;
    this never shuffles at all, and beyond 64 centroids the matrix
    ships as a broadcast column instead of literal SQL so expression
    size stays constant in k. ``refine_iters`` Lloyd iterations
    (deterministic, decimal-summed means — see _refine_centroids)
    tighten the seed partition; each iteration costs one k*dim-bounded
    aggregate, never a corpus-sized collect.
    """
    n_centroids = resolve_n_centroids(embeddings, n_centroids)
    cent = _collect_centroids(embeddings, n_centroids, id_col, vec_col, seed_mode)
    if refine_iters > 0:
        refined = _refine_centroids(
            embeddings, [v for _, v in cent], vec_col, refine_iters
        )
        cent = [(src, vec) for (src, _), vec in zip(cent, refined)]
    from pyspark.sql import types as T

    spark = embeddings.sparkSession
    schema = T.StructType(
        [
            T.StructField("centroid_id", T.IntegerType(), False),
            # carry the source id's own type — ids aren't always longs
            T.StructField("centroid_src", embeddings.schema[id_col].dataType, False),
            T.StructField("centroid_vec", T.ArrayType(T.DoubleType()), False),
        ]
    )
    centroids = spark.createDataFrame(
        [(i, src, vec) for i, (src, vec) in enumerate(cent)], schema
    )
    return centroids, _assign_to_centroids(embeddings, cent, id_col, vec_col)


def _assign_to_centroids(
    embeddings: DataFrame,
    cent: list[tuple],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared assignment body for ivf_assign and ivf_topk: one narrow
    argmax-cosine projection over the collected centroid set (literal
    matrix for small k, broadcast matrix for large — _with_centroid_id)."""
    return _with_centroid_id(
        embeddings.select(id_col, vec_col),
        [v for _, v in cent],
        vec_col,
        "centroid_id",
    ).select(id_col, vec_col, "centroid_id")


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int | None = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
    refine_iters: int = 0,
    seed_mode: str = "first",
) -> DataFrame:
    """IVF approximate top-k: probe the nprobe centroids nearest to the
    query, brute-force only their inverted lists.

    The probe ranking runs driver-side over the (bounded) centroid set —
    no Spark job just to pick nprobe ids; the only cluster work is the
    narrow candidate scan + k-row sort. ``n_centroids=None`` ->
    sqrt(N) lists; ``seed_mode="hash"`` for corpus-spread seeds.
    """
    import math

    n_centroids = resolve_n_centroids(embeddings, n_centroids)
    cent = _collect_centroids(embeddings, n_centroids, id_col, vec_col, seed_mode)
    if refine_iters > 0:
        refined = _refine_centroids(
            embeddings, [v for _, v in cent], vec_col, refine_iters
        )
        cent = [(src, vec) for (src, _), vec in zip(cent, refined)]
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))

    def qsim(vec: list[float]) -> float:
        d = sum(float(a) * b for a, b in zip(query_vec, vec))
        return d / (qn * math.sqrt(sum(x * x for x in vec)))

    ranked = sorted(
        ((qsim(vec), i) for i, (_, vec) in enumerate(cent)), key=lambda t: (-t[0], t[1])
    )
    probe_ids = [i for _, i in ranked[:nprobe]]
    assigned = _assign_to_centroids(embeddings, cent, id_col, vec_col)
    candidates = assigned.filter(F.col("centroid_id").isin(probe_ids))
    if exclude_id is not None:
        candidates = candidates.filter(F.col(id_col) != exclude_id)
    q = vector_literal(query_vec)
    sim = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        candidates.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), id_col)
        .limit(k)
        .select(id_col, F.round(F.col("sim"), 6).alias("sim"))
    )


def _hyperplanes(n_bits: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from sha256(bit:dim) — no RNG state,
    identical across runs/executors."""
    import hashlib

    planes = []
    for b in range(n_bits):
        row = []
        for d in range(dim):
            h = hashlib.sha256(f"{b}:{d}".encode()).digest()[0]
            row.append(1.0 if h % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def hyperplane_lsh_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_bits: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Cosine-LSH near-dup pairs: random-hyperplane signatures, banded
    candidate join, exact-cosine verification.

    The scale path when no blocking key exists: sign(v . h_b) bits are
    locality-sensitive for angle (P[bit match] = 1 - theta/pi), so banding
    r-bit chunks finds high-cosine pairs via equi-joins — never an
    all-pairs compare. Verification keeps only true pairs; recall at
    cos>=t is 1-(1-p^r)^bands (tune bands upward for higher recall).

    ``dim`` defaults to the data's own width (one first() probe) — a
    fixed plane matrix narrower than the vectors would silently zero the
    missing components' contribution.
    """
    r = n_bits // bands
    if dim is None:
        first = embeddings.select(vec_col).first()
        dim = len(first[0]) if first and first[0] is not None else 0
    planes = _hyperplanes(n_bits, dim)
    withnorm = embeddings.select(
        F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("nrm")
    )
    # ALL n_bits sign dots in ONE fold over the vector: the accumulator is
    # an n_bits-wide array, and each element folds x * sign(b, d) using a
    # dim-major sign-constant matrix. One pass per row and one constant
    # node, vs n_bits separate 64-wide aggregate()s each dragging its own
    # literal array through analysis/codegen (the old shape spent seconds
    # of fixed planner time before any data moved).
    # one SQL-parsed literal, not dim*n_bits F.lit() py4j calls (those
    # alone cost ~2.5s of driver time at 64x16)
    signs_by_dim = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{planes[b][d]}D" for b in range(n_bits)) + ")"
            for d in range(dim)
        )
        + ")"
    )
    indexed = F.transform(
        F.col(vec_col),
        lambda x, i: F.struct(x.cast("double").alias("x"), i.alias("i")),
    )
    sig_arr = F.aggregate(
        indexed,
        F.array_repeat(F.lit(0.0), n_bits),
        lambda acc, v: F.zip_with(
            acc,
            F.element_at(signs_by_dim, v["i"] + 1),
            lambda a, s: a + v["x"] * s,
        ),
    )
    # the fold is referenced by the packed signature AND every band key:
    # project it through an eval-once barrier so it runs once per row.
    # ensure_parallelism fans a single-split scan out first — the fold is
    # the per-row-heavy step, and the self-join below evaluates it twice.
    sig = eval_once(
        ensure_parallelism(embeddings.select(F.col(id_col), F.col(vec_col))),
        sig=sig_arr,
    ).drop(vec_col)
    # the whole signature packs into one int; band keys are r-bit slices.
    # Built as parsed SQL strings: one py4j round trip each instead of
    # ~5 per bit (driver build time is real bench time).
    mask_r = (1 << r) - 1
    sigbits_sql = " + ".join(
        f"shiftleft(cast(element_at(sig, {i + 1}) >= 0 as long), {i})"
        for i in range(n_bits)
    )
    band_keys_sql = (
        "array("
        + ",".join(
            f"struct({i} as band, shiftright(sigbits, {r * i}) & {mask_r}L as key)"
            for i in range(bands)
        )
        + ")"
    )
    sig = sig.withColumn("sigbits", F.expr(sigbits_sql))
    banded = sig.select(
        id_col, "sigbits", F.explode(F.expr(band_keys_sql)).alias("bk")
    ).select(
        id_col, "sigbits", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    # Candidates: codegen'd equi-self-join on (band, key). A pair colliding
    # in several bands would surface once per band; instead of distinct()
    # (a second shuffle over the candidate stream — the dominant
    # intermediate at scale) each pair is kept only in its FIRST colliding
    # band, a pure bit test on the two packed signatures already in hand.
    mask = (1 << r) - 1
    left = banded.select(
        F.col(id_col).alias("id_a"), F.col("sigbits").alias("bits_a"), "band", "key"
    )
    right = banded.select(
        F.col(id_col).alias("id_b"), F.col("sigbits").alias("bits_b"), "band", "key"
    )
    # unrolled over bands-1 terms (not exists()): stays inside whole-stage
    # codegen, no per-row sequence allocation
    first_band_only = (
        F.expr(
            " AND ".join(
                f"(band <= {bp} OR (shiftright(bits_a ^ bits_b, {r * bp}) & {mask}L) != 0)"
                for bp in range(bands - 1)
            )
        )
        if bands > 1
        else F.lit(True)
    )
    candidates = (
        left.join(right, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(first_band_only)
        .select("id_a", "id_b")
    )
    va = withnorm.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), F.col("nrm").alias("norm_a")
    )
    vb = withnorm.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), F.col("nrm").alias("norm_b")
    )
    sim = _dot(F.col("vec_a"), F.col("vec_b")) / (F.col("norm_a") * F.col("norm_b"))
    return (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 6).alias("sim"))
    )


def semantic_dedup(
    embeddings: DataFrame,
    n_centroids: int = 16,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
    salt_buckets: int = 8,
) -> DataFrame:
    """SemDeDup-style embedding-cluster dedup (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): cluster by nearest centroid, find within-cluster
    cosine near-dups, and per near-dup pair DROP the member farther from
    its centroid — keeping the most-central representative of every
    semantic neighborhood.

    Keep rule (deterministic, engine-portable): a vector loses a pair
    when the other member has strictly higher centroid-cosine, ties
    broken by lower id. Like SemDeDup itself this is a local rule —
    along a similarity chain a-b-c both a and b can drop even when
    sim(a,c) < threshold.

    Scale shape: clustering via :func:`ivf_assign`'s narrow argmax (no
    shuffle), so pair generation is the BLOCK equi-join of
    :func:`embedding_dup_pairs` keyed on centroid_id — per-cluster
    quadratic, never corpus-quadratic, salted against hot clusters; the
    centroid relation broadcasts. The centrality comparison costs NO
    join at all: each vector's centroid-cosine rides THROUGH the pair
    join inside the id (a (vid, ccos) struct — struct order = vid order
    since vids are unique), so the winner of every pair is decided
    pair-locally. The assignment relation is materialized once (eager
    localCheckpoint — four downstream subtrees read it; a production
    run would persist it to a table). The cluster count is the knob:
    clusters sized so a cluster's pair-space fits a task.

    Output: one row per vector — centroid_id, keep flag, n_near (its
    within-cluster near-dup degree).
    """
    centroids, assigned = ivf_assign(
        embeddings, n_centroids, id_col, vec_col, refine_iters
    )
    cvecs = centroids.select("centroid_id", "centroid_vec")
    cen = (
        assigned.join(F.broadcast(cvecs), "centroid_id")
        .select(
            F.col(id_col),
            F.col("centroid_id"),
            F.col(vec_col),
            (
                _dot(F.col(vec_col), F.col("centroid_vec"))
                / (_norm(F.col(vec_col)) * _norm(F.col("centroid_vec")))
            ).alias("ccos"),
        )
        .localCheckpoint(eager=True)
    )
    # ship ccos through the pair join as part of the id struct: ids are
    # unique, so (vid, ccos) orders exactly like vid and the dedup
    # pipeline's id_a < id_b / salting logic is undisturbed
    pairs = embedding_dup_pairs(
        cen.select(
            "centroid_id",
            F.struct(F.col(id_col).alias("vid"), F.col("ccos").alias("ccos")).alias(
                id_col
            ),
            vec_col,
        ),
        threshold=threshold,
        block_col="centroid_id",
        id_col=id_col,
        vec_col=vec_col,
        salt_buckets=salt_buckets,
    ).select(
        F.col("id_a.vid").alias("id_a"),
        F.col("id_a.ccos").alias("ccos_a"),
        F.col("id_b.vid").alias("id_b"),
        F.col("id_b.ccos").alias("ccos_b"),
    )
    # both the loser projection and the degree count read the (small)
    # pair relation — pin it so the salted block join runs once
    pairs = pairs.localCheckpoint(eager=False)
    lose = (
        pairs.select(
            F.when(
                (F.col("ccos_a") > F.col("ccos_b"))
                | (
                    (F.col("ccos_a") == F.col("ccos_b"))
                    & (F.col("id_a") < F.col("id_b"))
                ),
                F.col("id_b"),
            )
            .otherwise(F.col("id_a"))
            .alias(id_col)
        )
        .distinct()
        .withColumn("__lost", F.lit(True))
    )
    n_near = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionAll(pairs.select(F.col("id_b").alias(id_col)))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_near"))
    )
    return (
        cen.select(id_col, "centroid_id")
        .join(lose, id_col, "left")
        .join(n_near, id_col, "left")
        .select(
            id_col,
            "centroid_id",
            F.coalesce(~F.col("__lost"), F.lit(True)).alias("keep"),
            F.coalesce("n_near", F.lit(0).cast("long")).alias("n_near"),
        )
    )


def quantize_int8(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization, exploded to (id, idx, q).

    The ANN memory lever at 100 TB: fp64 -> int8 shrinks the resident
    index 8x while dot products stay SIMD-friendly; scale = amax/127 per
    vector reconstructs within 0.4% amax. Rounding is floor(x/scale+0.5)
    — identical IEEE ops in any engine (see docs/DETERMINISM.md), not
    engine-native round(). All-zero vectors quantize to 0 with scale 0.
    Row-local throughout: no shuffle at any corpus size.
    """
    from iheardai_data_pipeline_spark.sources.batch import eval_once

    amax = F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, F.abs(v.cast("double"))),
    )
    base = eval_once(embeddings, scale=amax / F.lit(127.0))
    exploded = base.select(
        F.col(id_col),
        F.col("scale"),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    )
    q = F.when(
        F.col("scale") > 0,
        F.floor(F.col("x").cast("double") / F.col("scale") + F.lit(0.5)).cast("int"),
    ).otherwise(F.lit(0))
    return exploded.select(
        F.col(id_col),
        (F.col("pos") + 1).alias("idx"),
        q.alias("q"),
        F.col("scale"),
    )
