"""Embedding dimensionality reduction — the pre-ANN memory/compute
lever at 100 TB.

A 100 TB corpus with 768-dim float32 embeddings carries ~3 TB of raw
vector payload per billion docs; every ANN structure downstream (IVF
lists, PQ codes, near-dup graphs) scales with the input dimension. The
two standard levers, both expressed as narrow row-local projections so
they cost ZERO shuffles and ride whole-stage codegen:

- **Johnson-Lindenstrauss random projection** (:func:`jl_project`):
  a deterministic seed-addressed ±1 sign matrix (Achlioptas 2001,
  "Database-friendly random projections" — sign matrices satisfy the
  JL lemma with the same distortion bound as Gaussians and need no
  float matrix shipping: the matrix IS the seed). Each output
  coordinate is one left-fold dot product; :func:`jl_project_sql`
  emits the SAME fold for Spark and DuckDB (identical
  left-associated IEEE double op order, every literal an explicit
  DOUBLE), so projections are bit-exact value-oracle-checkable —
  the pq.py / bpe.py portability pattern.
- **PCA** split into its scale-honest halves:
  * :func:`comoment_sums` — the distributed half: EXACT-INTEGER
    second-moment accumulation over globally-scaled int8-quantized
    vectors (quantize first, so every product and sum is a BIGINT:
    partition-order-independent, hash-stable across engines — floats
    summed across rows would be neither). State is d*(d+1)/2 cells +
    d dim-sums, NEVER a corpus collect; the d^2-cell relation is what
    a 1000-executor job ships to the driver, exactly like pq_train's
    m*k*dsub aggregation.
  * :func:`pca_project` — the read-path half: eigenvectors are an
    index-build artifact (computed once from the tiny co-moment
    relation, pinned per-SF like plans/ann_artifact.py); projection
    is a generated fold over (q_i - mu_i) * w_ki with identical op
    order in both engines, so projected coordinates are bit-exact.

Plus the graph consumers feed on (:func:`knn_graph`): an exact
within-cluster top-k neighbor list over IVF cells — the SemDeDup-style
blocking that turns all-pairs O(n^2) into O(n^2 / k_lists) without any
LSH miss probability inside a cell.

Reference parity: the reference pipeline ships embeddings through its
text-agent transformers as opaque payloads
(/root/reference/etl/transform/text_agent_transformer.py); reduction /
kNN-graph construction is part of the training-data extension surface,
not a reference port.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism, eval_once


# --- Johnson-Lindenstrauss sign projection -----------------------------------------


def jl_signs(in_dim: int, out_dim: int, seed: str = "jl-v1") -> list[list[float]]:
    """Deterministic ±1.0 sign matrix (out_dim x in_dim), addressed by
    md5(seed:j:i) parity. The matrix never ships anywhere — any worker
    (or the DuckDB oracle generator) re-derives it from the seed, which
    is the point of sign JL at cluster scale."""
    rows = []
    for j in range(out_dim):
        row = []
        for i in range(in_dim):
            h = hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()
            row.append(1.0 if int(h[0], 16) % 2 == 0 else -1.0)
        rows.append(row)
    return rows


def _dbl(x: float, engine: str) -> str:
    """One float as an engine DOUBLE literal. DuckDB gets the STRING
    cast form: a bare 17-digit decimal parses as DECIMAL and DuckDB's
    decimal->double conversion is off by one ulp on many values
    (measured: 0.10965818845709593::DOUBLE != the Python double, while
    CAST('0.10965818845709593' AS DOUBLE) round-trips exactly) — the
    string path is the correctly-rounded strtod both engines share."""
    if engine == "spark":
        return f"{x!r}D"
    return f"CAST('{x!r}' AS DOUBLE)"


def _dlist(vals: list[float], engine: str) -> str:
    """A float list as an engine literal, every cell an exact DOUBLE
    (see _dbl for why DuckDB needs the string-cast form)."""
    if engine == "spark":
        return "array(" + ",".join(_dbl(x, engine) for x in vals) + ")"
    return "[" + ",".join(_dbl(x, engine) for x in vals) + "]"


def jl_project_sql(
    vec_ref: str, signs_j: list[float], scale: float, engine: str
) -> str:
    """One projected coordinate for one engine: left fold from 0.0 of
    x_i * sign_i, then one multiply by the 1/sqrt(out_dim) scale —
    identical float-op order on both sides."""
    lit = _dlist(signs_j, engine)
    if engine == "spark":
        return (
            f"aggregate(zip_with({vec_ref}, {lit}, "
            f"(x, s) -> CAST(x AS DOUBLE) * s), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) * {_dbl(scale, engine)}"
        )
    if engine == "duckdb":
        return (
            f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(list_zip({vec_ref}, {lit}), "
            f"z -> CAST(z[1] AS DOUBLE) * z[2])), "
            f"(acc, v) -> acc + v) * {_dbl(scale, engine)}"
        )
    raise ValueError(engine)


def jl_project(
    embeddings: DataFrame,
    in_dim: int = 64,
    out_dim: int = 16,
    seed: str = "jl-v1",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, proj array<double>[out_dim]): the JL sign projection as ONE
    narrow projection — out_dim generated folds, no shuffle, no UDF.
    Distance preservation is the JL lemma's guarantee, gated separately
    by the x_embed_jl_recall contract."""
    signs = jl_signs(in_dim, out_dim, seed)
    scale = 1.0 / math.sqrt(out_dim)
    exprs = [
        F.expr(jl_project_sql(f"`{vec_col}`", signs[j], scale, "spark"))
        for j in range(out_dim)
    ]
    return ensure_parallelism(
        embeddings.where(F.col(vec_col).isNotNull())
    ).select(F.col(id_col), F.array(*exprs).alias("proj"))


# --- exact-integer PCA moments ------------------------------------------------------


def quantize_global_sql(vec_ref: str, scale: float, engine: str) -> str:
    """Globally-scaled symmetric int quantization of a vector column
    with a PINNED scale literal — q_i = round-half-up(x_i / scale),
    the same rounding form as similarity.quantize_int8 / its oracle.
    Row-local; identical in both engines."""
    if scale <= 0:
        # degenerate all-zero corpus: everything quantizes to 0
        zero = "transform({v}, x -> 0)" if engine == "spark" else (
            "list_transform({v}, x -> 0)"
        )
        return zero.format(v=vec_ref)
    if engine == "spark":
        return (
            f"transform({vec_ref}, x -> "
            f"CAST(floor(CAST(x AS DOUBLE) / {_dbl(scale, engine)} + 0.5D) AS INT))"
        )
    if engine == "duckdb":
        return (
            f"list_transform({vec_ref}, x -> "
            f"CAST(floor(CAST(x AS DOUBLE) / {_dbl(scale, engine)} + 0.5::DOUBLE) AS INT))"
        )
    raise ValueError(engine)


def comoment_sums(
    embeddings: DataFrame,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float | None = None,
) -> DataFrame:
    """Upper-triangle co-moment sums over GLOBALLY int8-quantized
    vectors: (i, j, sxy, si, sj, n) for 0 <= i <= j < dim, all BIGINT —
    exact integers, so the result is independent of partition order and
    hash-stable against any engine.

    Covariance derives outside the engine (artifact build time):
    cov_ij = (n*sxy - si*sj) / n^2 in the quantized space; eigenvectors
    of that matrix are PCA components up to the global scale, which
    cancels in the eigenbasis.

    Shape: one MAX aggregation for the global scale (broadcast back as
    a 1-row scalar), one flatten-explode of each row's d*(d+1)/2
    quantized products, one partial-agg groupBy on (i,j) — the shuffled
    relation is d^2-bounded, NEVER corpus-sized. At dim=64 that is 2080
    cells regardless of corpus size; a 1000-executor run ships 2080
    rows to the final reducer.

    ``scale``: None (default) derives the quantization step from the
    data (amax/127 — the one-shot build). A PINNED float makes the
    whole computation row-local AND the resulting cells exactly
    SUM-mergeable across any split of the corpus — per-batch amax
    would quantize each batch on a different grid, so incremental /
    streaming maintenance (t19) MUST pin the scale (the same reason
    pca_project pins it).
    """
    base = ensure_parallelism(embeddings.where(F.col(vec_col).isNotNull()))
    if scale is None:
        amax = base.agg(
            F.max(
                F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x)))
            ).alias("__amax")
        )
        scaled = base.crossJoin(F.broadcast(amax))
        q = F.expr(
            "transform(`{v}`, x -> CASE WHEN __amax > 0 THEN "
            "CAST(floor(CAST(x AS DOUBLE) / (CAST(__amax AS DOUBLE) / 127.0D) "
            "+ 0.5D) AS INT) ELSE 0 END)".format(v=vec_col)
        )
    else:
        scaled = base
        q = F.expr(quantize_global_sql(f"`{vec_col}`", scale, "spark"))
    rows = eval_once(scaled, __q=q)
    # ONE explode carries both the upper-triangle products and, as
    # j = -1 marker rows, the per-dimension first moments — so the
    # corpus is scanned once and everything funnels through a single
    # (dim^2-bounded) groupBy; deriving the dim sums from a second
    # explode would re-run the whole quantize subtree (and, in the
    # data-derived-scale mode, the amax aggregation) per consumer
    pairs = rows.select(
        F.explode(
            F.expr(
                f"flatten(transform(sequence(0, {dim - 1}), i -> "
                f"concat("
                f"transform(sequence(i, {dim - 1}), j -> "
                f"struct(i AS i, j AS j, "
                f"CAST(element_at(__q, i + 1) AS BIGINT) * "
                f"element_at(__q, j + 1) AS xy)), "
                f"array(struct(i AS i, -1 AS j, "
                f"CAST(element_at(__q, i + 1) AS BIGINT) AS xy)))))"
            )
        ).alias("p")
    ).select("p.i", "p.j", "p.xy")
    # eagerly pinned: referenced by mom + two dim-sum branches, and each
    # un-pinned reference would re-run the corpus scan (read_keys
    # lesson); the relation is d^2-bounded, so pinning is scale-safe.
    # localCheckpoint, NOT cache(): this runs once per micro-batch in
    # t19's foreachBatch, and cache entries live in the catalog until an
    # explicit unpersist — checkpoint blocks are freed by the context
    # cleaner when the frame goes out of scope, so repeated calls don't
    # accumulate session-lifetime state
    sums = (
        pairs.groupBy("i", "j")
        .agg(F.sum("xy").alias("sxy"), F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    dims = sums.filter(F.col("j") == -1).select("i", F.col("sxy").alias("s"))
    mom = sums.filter(F.col("j") >= 0)
    return (
        mom.join(F.broadcast(dims.select("i", F.col("s").alias("si"))), "i")
        .join(
            F.broadcast(
                dims.select(F.col("i").alias("j"), F.col("s").alias("sj"))
            ),
            "j",
        )
        .select("i", "j", "sxy", "si", "sj", "n")
    )


def pca_project_sql(
    q_ref: str, mu: list[float], w_k: list[float], engine: str
) -> str:
    """One PCA coordinate for one engine: left fold from 0.0 of
    (q_i - mu_i) * w_ki over the quantized vector, with the mean and
    component as pinned DOUBLE literals — identical float-op order on
    both sides."""
    d = len(mu)
    mu_l = _dlist(mu, engine)
    w_l = _dlist(w_k, engine)
    if engine == "spark":
        return (
            f"aggregate(sequence(0, {d - 1}), CAST(0.0 AS DOUBLE), "
            f"(acc, i) -> acc + (CAST(element_at({q_ref}, i + 1) AS DOUBLE) "
            f"- element_at({mu_l}, i + 1)) * element_at({w_l}, i + 1))"
        )
    if engine == "duckdb":
        return (
            f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(range(1, {d + 1}), i -> "
            f"(CAST({q_ref}[i] AS DOUBLE) - {mu_l}[i]) * {w_l}[i])), "
            f"(acc, v) -> acc + v)"
        )
    raise ValueError(engine)


def pca_project(
    embeddings: DataFrame,
    scale: float,
    mu: list[float],
    components: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, proj array<double>[n_components]): center-and-rotate onto
    the pinned principal components, entirely row-local (the pinned
    scale makes even quantization shuffle-free — the read path of PCA
    never aggregates anything). Bit-exact against the DuckDB twin
    generated from the same (scale, mu, components) artifact."""
    qd = eval_once(
        ensure_parallelism(embeddings.where(F.col(vec_col).isNotNull())),
        __q=F.expr(quantize_global_sql(f"`{vec_col}`", scale, "spark")),
    )
    exprs = [
        F.expr(pca_project_sql("__q", mu, w_k, "spark")) for w_k in components
    ]
    return qd.select(F.col(id_col), F.array(*exprs).alias("proj"))


# --- cluster-pruned exact kNN graph -------------------------------------------------


def knn_graph(
    embeddings: DataFrame,
    k: int = 5,
    n_centroids: int | None = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Within-cluster exact top-k neighbor graph: (vec_id, nbr_id,
    rank, sim) — the blocking pattern every graph consumer here
    (components, k-core, triangles, SemDeDup) feeds on.

    IVF assignment (deterministic seed centroids — the oracle-portable
    ivf_assign contract) splits the corpus into cells; candidate pairs
    exist ONLY within a cell (equi-join on centroid_id, never a cross
    join), then one window per source node ranks by (cosine desc, id
    asc). Cosine is rounded to 6 dp BEFORE ranking so both engines
    rank identical values (the x_sim_embedding_dups parity rule).

    Scale: pair work is sum over cells of |cell|^2 — with the sqrt(N)
    centroid rule (n_centroids=None) that is O(N^1.5) total and each
    cell is independent, the standard SemDeDup-scale tradeoff. Recall
    loss at cell boundaries is the documented price of exactness
    inside the cell; multi-probe assignment is the lever when edges
    near boundaries matter.
    """
    from iheardai_data_pipeline_spark.operators.similarity import _dot, _norm, ivf_assign

    _, assigned = ivf_assign(
        embeddings.where(F.col(vec_col).isNotNull()),
        n_centroids=n_centroids,
        id_col=id_col,
        vec_col=vec_col,
    )
    # one norm fold per ROW (not per pair — a pair-side norm would cost
    # 3 folds per candidate instead of 1), and eagerly pin so the
    # self-join's two branches don't each re-run the argmax assignment
    # (the prefix_filter_pairs profile-cache pattern; at cluster scale
    # this is the standard materialize-before-self-join). localCheckpoint
    # rather than cache(): blocks are context-cleaner-freed when the
    # frame is dropped, so repeated calls don't accumulate cache entries
    prof = eval_once(
        assigned, __invn=F.lit(1.0) / _norm(F.col(vec_col))
    ).localCheckpoint(eager=True)
    a = prof.select(
        F.col(id_col).alias("__src"),
        F.col(vec_col).alias("__va"),
        F.col("__invn").alias("__ia"),
        "centroid_id",
    )
    b = prof.select(
        F.col(id_col).alias("__nbr"),
        F.col(vec_col).alias("__vb"),
        F.col("__invn").alias("__ib"),
        "centroid_id",
    )
    pairs = (
        a.join(b, "centroid_id")
        .filter(F.col("__src") != F.col("__nbr"))
        .select(
            "__src",
            "__nbr",
            # dot * inva * invb lands within ulps of dot/(na*nb); the
            # 6-dp rounding BOTH engines rank on absorbs the difference
            # (the x_sim_embedding_dups parity rule) — re-verified at
            # all three SFs after this rewrite
            F.round(
                _dot(F.col("__va"), F.col("__vb"))
                * F.col("__ia")
                * F.col("__ib"),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("__src").orderBy(F.desc("sim"), F.asc("__nbr"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__src").alias(id_col),
            F.col("__nbr").alias("nbr_id"),
            "rank",
            "sim",
        )
    )


def _topn_centroid_expr(cent_vecs: list[list[float]], vec_col: str, nprobe: int):
    """Row-local TOP-``nprobe`` max-cosine centroid ids as one ordered
    array expression — the multi-assignment generalization of
    similarity._argmax_centroid_expr (same literal matrix, same
    per-centroid 1/|c| constants, same scores-array-built-once
    discipline). Ordering is (score desc, centroid id asc): the struct
    sort key is (-score, id), so ties break to the lower id exactly
    like the argmax's strict > and the oracle's ORDER BY s DESC, cid."""
    import math

    n = len(cent_vecs)
    cents = "array(" + ",".join(
        "array(" + ",".join(f"{x!r}D" for x in c) + ")" for c in cent_vecs
    ) + ")"
    invn = "array(" + ",".join(
        f"{1.0 / math.sqrt(sum(x * x for x in c))!r}D" for c in cent_vecs
    ) + ")"
    scores = f"""
        transform(sequence(0, {n - 1}), i ->
          aggregate(zip_with(`{vec_col}`, element_at({cents}, i + 1),
                             (a, b) -> CAST(a AS DOUBLE) * b),
                    0.0D, (p, v) -> p + v) * element_at({invn}, i + 1))
    """
    return F.expr(
        f"""
        slice(
          transform(
            array_sort(zip_with({scores}, sequence(0, {n - 1}),
                                (s, i) -> struct(-s AS negs, i AS i))),
            x -> x.i),
          1, {nprobe})
        """
    )


def knn_graph_multiprobe(
    embeddings: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`knn_graph` with MULTI-ASSIGNMENT: every vector lives in
    its top-``nprobe`` cells, and candidates are pairs sharing ANY
    cell — the standard lever against the single-probe variant's only
    recall loss (true neighbors split by a cell boundary). Pair work
    scales by ~nprobe^2 (each vector appears in nprobe cells), the
    documented price of boundary recall; everything else — exact
    in-cell cosine, round-6-then-rank parity, (sim desc, id asc)
    ties — matches knn_graph, and the output schema is identical so
    the two are drop-in interchangeable.
    """
    from iheardai_data_pipeline_spark.operators.similarity import (
        _collect_centroids,
        _dot,
        _norm,
    )

    base = ensure_parallelism(embeddings.where(F.col(vec_col).isNotNull()))
    cent = _collect_centroids(base, n_centroids, id_col, vec_col, "first")
    cells = (
        eval_once(
            base.select(id_col, vec_col),
            __invn=F.lit(1.0) / _norm(F.col(vec_col)),
            __cells=_topn_centroid_expr([v for _, v in cent], vec_col, nprobe),
        )
        .select(
            id_col, vec_col, "__invn", F.explode("__cells").alias("cell")
        )
        .localCheckpoint(eager=True)
    )
    a = cells.select(
        F.col(id_col).alias("__src"),
        F.col(vec_col).alias("__va"),
        F.col("__invn").alias("__ia"),
        "cell",
    )
    b = cells.select(
        F.col(id_col).alias("__nbr"),
        F.col(vec_col).alias("__vb"),
        F.col("__invn").alias("__ib"),
        "cell",
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("__src") != F.col("__nbr"))
        # a pair sharing BOTH probed cells must be reported once — but
        # the duplicate rows carry the SAME two vectors, so their sims
        # are bit-identical: score row-locally FIRST and dedup the
        # narrow (src, nbr, sim) rows. The old shape dropDuplicates'd
        # with both vector payloads aboard, shuffling ~40x the bytes
        # (guide §2.3 — shuffle keys and metadata, not payloads; this
        # exchange OOM-killed the 1g sweep JVM at sf0.1)
        .select(
            "__src",
            "__nbr",
            F.round(
                _dot(F.col("__va"), F.col("__vb"))
                * F.col("__ia")
                * F.col("__ib"),
                6,
            ).alias("sim"),
        )
        .dropDuplicates(["__src", "__nbr"])
    )
    w = Window.partitionBy("__src").orderBy(F.desc("sim"), F.asc("__nbr"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__src").alias(id_col),
            F.col("__nbr").alias("nbr_id"),
            "rank",
            "sim",
        )
    )
