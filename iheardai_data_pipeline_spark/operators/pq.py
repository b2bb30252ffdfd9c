"""Product quantization (PQ / IVF-PQ building block): the 100 TB ANN
memory answer.

A 64-dim float32 vector is 256 bytes; its PQ code is ``m`` small ints
(here 8 x 4-bit codes) — a 32-64x memory shrink that turns a
corpus-wide ANN scan into lookup-table arithmetic (Jegou et al. 2011,
"Product Quantization for Nearest Neighbor Search"). The pieces:

- **Training** (:func:`pq_train`): split each vector into ``m``
  subvectors; per subspace, Lloyd-iterate ``k`` centroids
  (deterministic: hash-sampled seeds, DECIMAL-summed means — the same
  determinism discipline as IVF refinement). Distributed: each round is
  one narrow assignment projection + one (m*k*dsub)-cell aggregation —
  never a corpus-sized collect. The codebook artifact is
  ``m x k x dsub`` floats, shipped like any model artifact.
- **Encoding** (:func:`pq_encode`): per subspace, the argmin-distance
  code as one generated HIGHER-ORDER-FUNCTION expression (transform +
  zip_with + left fold — loops, not an unrolled literal chain, so
  codegen stays small at any k). :func:`subspace_code_sql` emits the
  same computation for Spark and DuckDB with IDENTICAL float-op order
  (left-associated IEEE double fold from 0.0), so the codes are
  BIT-IDENTICAL across engines and the encode step is
  value-oracle-checkable, exactly like the BPE replace chain.
- **Search** (:func:`pq_adc_topk`): asymmetric distance — the query
  builds an ``m x k`` lookup table driver-side; each row's distance is
  ``sum_s lut[s][code_s]``, a fold over its (tiny) code array. No
  vector arithmetic per row at query time, which is the entire point
  at 100 TB: the scan touches 8-byte codes, not 256-byte vectors.

Ties everywhere break to the LOWEST code index — both engines take
position-of-first-minimum over the distance list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism, eval_once


def _cb_literal(codebook_s: list[list[float]], engine: str) -> str:
    """The k x dsub subspace codebook as an engine literal (every cell
    an explicit DOUBLE — DuckDB parses bare decimals as DECIMAL, whose
    arithmetic would diverge from Spark's doubles)."""
    if engine == "spark":
        return (
            "array("
            + ",".join(
                "array(" + ",".join(f"{x!r}D" for x in c) + ")"
                for c in codebook_s
            )
            + ")"
        )
    return (
        "["
        + ",".join(
            "[" + ",".join(f"{x!r}::DOUBLE" for x in c) + "]"
            for c in codebook_s
        )
        + "]"
    )


def _subspace_dists_sql(
    vec_ref: str, s: int, codebook_s: list[list[float]], engine: str
) -> str:
    """Engine expression for the k-vector of squared-L2 distances from
    subspace ``s`` of ``vec_ref`` to each centroid, as a left fold from
    0.0 (identical float-op order in both engines)."""
    dsub = len(codebook_s[0])
    a = s * dsub + 1
    cb = _cb_literal(codebook_s, engine)
    if engine == "spark":
        return f"""transform({cb}, c -> aggregate(
            zip_with(slice({vec_ref}, {a}, {dsub}), c,
                     (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),
            CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"""
    if engine == "duckdb":
        return f"""list_transform({cb}, c -> list_reduce(
            list_prepend(0.0::DOUBLE,
                list_transform(list_zip({vec_ref}[{a}:{a + dsub - 1}], c),
                    z -> (CAST(z[1] AS DOUBLE) - z[2]) * (CAST(z[1] AS DOUBLE) - z[2]))),
            (acc, v) -> acc + v))"""
    raise ValueError(engine)


def subspace_code_sql(
    vec_ref: str, s: int, codebook_s: list[list[float]], engine: str
) -> str:
    """Subspace-``s`` code (0-based int) for one engine: squared-L2 to
    each of the k centroids as a left fold from 0.0 (identical float-op
    order in both engines), then position-of-first-min. ``vec_ref`` is
    the vector column reference in that engine's syntax."""
    dists = _subspace_dists_sql(vec_ref, s, codebook_s, engine)
    if engine == "spark":
        return f"(array_position({dists}, array_min({dists})) - 1)"
    return f"(list_position({dists}, list_min({dists})) - 1)"


def quantization_error(codebooks, vec_col: str = "embedding"):
    """Total squared quantization error of ``codebooks`` over the corpus
    — sum over rows of sum over subspaces of the distance to the CHOSEN
    (argmin) centroid. DECIMAL-summed so the total is independent of
    partition order; the Lloyd-quality contract (trained error <= seed
    error) compares two of these exactly."""
    per_row = None
    for s, cb in enumerate(codebooks):
        d = F.expr(
            f"array_min({_subspace_dists_sql(f'`{vec_col}`', s, cb, 'spark')})"
        )
        per_row = d if per_row is None else per_row + d
    return F.sum(per_row.cast("decimal(28,16)"))


def _spark_code_cols(codebooks, vec_col: str) -> dict:
    """LITERAL-tree code columns — the reference implementation the
    broadcast path below must match bit for bit (kept for that property
    test and for one-off tooling; query paths use :func:`with_pq_codes`,
    whose plans stay constant-size in the codebook)."""
    return {
        f"__c{s}": F.expr(
            subspace_code_sql(f"`{vec_col}`", s, cb, "spark")
        ).cast("int")
        for s, cb in enumerate(codebooks)
    }


def _subspace_code_ref_sql(vec_ref: str, s: int, dsub: int) -> str:
    """The :func:`subspace_code_sql` fold with the subspace codebook
    read from the broadcast ``__books`` COLUMN (one data row) instead
    of an inlined literal tree. Arithmetic is token-identical — same
    left fold from 0.0, same argmin tie-break — so the codes are
    bit-identical to the literal path (pinned by test); only where the
    k x dsub doubles COME FROM changes (guide §3.1/§5: ship constants
    as broadcast data, keep the plan small — re-analyzing ~2k-literal
    expression trees per encode was pure driver planning cost)."""
    a = s * dsub + 1
    cb = f"element_at(`__books`, {s + 1})"
    dists = f"""transform({cb}, c -> aggregate(
            zip_with(slice({vec_ref}, {a}, {dsub}), c,
                     (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),
            CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"""
    return f"(array_position({dists}, array_min({dists})) - 1)"


def with_pq_codes(df: DataFrame, codebooks, vec_col: str) -> DataFrame:
    """``df`` + ``__c0..__c{m-1}`` per-subspace argmin code columns,
    with the codebooks attached as ONE broadcast data row (the
    ann_index topk_batch artifact-row pattern) rather than inlined
    literals: expression/codegen size stays constant in the codebook
    size, so per-call analysis cost vanishes. Row-local compute, no
    shuffle of ``df``; codes are bit-identical to the literal
    :func:`_spark_code_cols` path (property-tested)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    books = [[[float(x) for x in c] for c in book] for book in codebooks]
    const = df.sparkSession.createDataFrame(
        [(books,)], "__books array<array<array<double>>>"
    )
    out = eval_once(
        df.crossJoin(F.broadcast(const)),
        **{
            f"__c{s}": F.expr(
                _subspace_code_ref_sql(f"`{vec_col}`", s, dsub)
            ).cast("int")
            for s in range(m)
        },
    )
    return out.drop("__books")


def pq_encode(
    embeddings: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: tuple = (),
) -> DataFrame:
    """(id, codes array<int>, *extra_cols): each vector's per-subspace
    argmin codes. One narrow projection — no shuffle, no UDF; the
    expression is the generated fold above, shared with the oracle
    (the codebook riding as a broadcast data row — same argmin values,
    bit for bit). ``extra_cols`` pass through unchanged (e.g. the IVF
    list id, so a per-list ADC can read it without re-joining)."""
    m = len(codebooks)
    out = with_pq_codes(
        ensure_parallelism(embeddings.where(F.col(vec_col).isNotNull())),
        codebooks,
        vec_col,
    )
    return out.select(
        F.col(id_col),
        F.array(*[F.col(f"__c{s}") for s in range(m)]).alias("codes"),
        *[F.col(c) for c in extra_cols],
    )


def normalize_rows(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """L2-normalize row vectors (zero-norm rows EXCLUDED — they have no
    direction and 0/0 would NaN-poison every downstream distance). The
    exact projection ivfpq_search applies; exposed so index-build
    tooling (tools/regen_ann_artifacts.py) trains artifacts on the
    identical vectors the read path scores."""
    nrm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda a, v: a + v.cast("double") * v.cast("double"),
        )
    )
    # norm behind a generator barrier: inlined into the per-element
    # lambda it would re-run the fold once per dimension
    return (
        eval_once(embeddings.where(F.col(vec_col).isNotNull()), __nrm=nrm)
        .where(F.col("__nrm") > 0)
        .select(
            F.col(id_col),
            F.transform(
                F.col(vec_col), lambda v: v.cast("double") / F.col("__nrm")
            ).alias(vec_col),
        )
    )


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allow_fewer: bool = False,
):
    """Deterministic distributed PQ training; returns [m][k][dsub]
    codebooks.

    Seeds: the ``k`` vectors with the smallest ``xxhash64(id)`` (a
    uniform, order-independent sample), subsplit per subspace. Each
    Lloyd round: encode with the current books (narrow), posexplode
    subvector components, and take per-(subspace, code, dim) means with
    DECIMAL(28,16) sums so the result is independent of partition
    order. Empty cells keep their previous centroid. The aggregate
    state is m*k*dsub cells regardless of corpus size.

    ``allow_fewer=True`` degrades ``k`` to the number of available
    vectors instead of raising — for composed callers (ivfpq_search)
    where a small corpus or a sparse residual set must still quantize
    (fewer codes = coarser, never broken).
    """
    emb = embeddings.where(F.col(vec_col).isNotNull())
    dim_row = emb.select(F.size(vec_col).alias("d")).first()
    if dim_row is None:
        raise ValueError("pq_train: empty embeddings input")
    dim = dim_row["d"]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    dsub = dim // m
    seeds = [
        [float(x) for x in r[vec_col]]
        # fan the seed scan out first: orderBy().limit() runs as a
        # per-partition top-k + driver merge, so a single-split input
        # would rank the whole corpus on one core (the sort keys are
        # total, so partitioning cannot change which rows win)
        for r in ensure_parallelism(emb)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(k)
        .select(vec_col)
        .collect()
    ]
    if len(seeds) < k:
        if not allow_fewer or not seeds:
            raise ValueError(f"pq_train: need >= {k} vectors, got {len(seeds)}")
        k = len(seeds)
    books = [
        [[v[s * dsub + t] for t in range(dsub)] for v in seeds]
        for s in range(m)
    ]
    for _ in range(iters):
        coded = with_pq_codes(
            ensure_parallelism(emb.select(vec_col)), books, vec_col
        )
        comps = coded.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("s"),
                            F.col(f"__c{s}").alias("code"),
                            F.slice(vec_col, s * dsub + 1, dsub).alias("sub"),
                        )
                        for s in range(m)
                    ]
                )
            ).alias("e")
        ).select(
            "e.s", "e.code", F.posexplode("e.sub").alias("pos", "x")
        )
        cells = (
            comps.groupBy("s", "code", "pos")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(28,16)")) / F.count(F.lit(1))
                )
                .cast("double")
                .alias("mean")
            )
            .collect()
        )
        new_books = [[list(c) for c in cb] for cb in books]
        for row in cells:
            new_books[row["s"]][row["code"]][row["pos"]] = row["mean"]
        books = new_books
    return books


def pq_adc_topk(
    codes: DataFrame,
    codebooks,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    exclude_id: int | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query precomputes an
    m x k lookup table of subspace distances driver-side (m*k floats —
    an index-build-sized constant), and each row's approximate squared
    distance is an m-term fold over its code array. Returns
    (id, adc_dist) ascending, ties by id."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    lut = [
        [
            sum((query_vec[s * dsub + t] - c[t]) ** 2 for t in range(dsub))
            for c in codebooks[s]
        ]
        for s in range(m)
    ]
    lut_lit = (
        "array("
        + ",".join(
            "array(" + ",".join(f"{x!r}D" for x in row) + ")" for row in lut
        )
        + ")"
    )
    dist = F.expr(
        f"""
        aggregate(
          zip_with(`{codes_col}`, sequence(0, {m - 1}),
                   (c, s) -> element_at(element_at({lut_lit}, s + 1), c + 1)),
          CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
        """
    )
    out = codes
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return (
        out.select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(k)
        .select(id_col, F.round("adc_dist", 6).alias("adc_dist"))
    )


def ivfpq_search(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    k_codes: int = 16,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
    seed_mode: str = "first",
    residual: bool = False,
    centroids: list[list[float]] | None = None,
    books=None,
) -> DataFrame:
    """The composed production ANN read path: IVF prunes lists, ADC
    ranks PQ codes inside the probed lists, and only the shortlist's
    full vectors are fetched for an EXACT re-rank.

    Scan anatomy at 100 TB: centroid table broadcast (narrow argmax
    assignment), ~nprobe/n_centroids of the code table scanned (8-byte
    codes, not 256-byte vectors), then ``shortlist`` point lookups of
    raw vectors (bucket-pruned reads in a real deployment).

    ``residual=True`` is the classic IVF-PQ refinement (Jegou et al.
    sec. V): quantize ``v - centroid(v)`` instead of ``v``. Residuals
    are much smaller than raw vectors, so the same 4-bit codebooks
    spend their resolution on the part IVF didn't already explain; at
    query time the ADC lookup table is built PER PROBED LIST from
    ``q - centroid_l`` (nprobe * m * k driver floats) and each row
    scores against its own list's table — one CASE branch per probed
    list around the same code-array fold. Measured: the residual ADC
    ranks true neighbors high enough that a ~4x smaller shortlist
    reaches the same recall (tests/test_pq.py).

    Vectors (and the query) are L2-NORMALIZED up front — a row-local
    projection. This makes every stage rank the same way: IVF assigns
    by cosine, while PQ/ADC and the re-rank are L2-based, and on unit
    vectors ||a-b||^2 = 2 - 2*cos(a,b), so L2 order IS cosine order.
    Without it the list pruning and the distance metric disagree and
    recall collapses (measured 0.1-0.3 raw vs 0.9-1.0 normalized on
    the rig corpora). Output distances are on the normalized vectors.
    Zero-norm rows have no direction under either metric and are
    EXCLUDED up front (0/0 would otherwise poison their assignment
    and every distance with NaN).

    ``centroids`` / ``books`` inject PINNED index artifacts (IVF
    centroid vectors and PQ codebooks, both over the NORMALIZED
    vectors — see plans/pq_artifact.py): the production read path,
    where training happened at index build. When None, both are
    trained in-query (works at any scale factor, but the query then
    times Lloyd training, not search). With ``residual=True``,
    ``books`` are residual codebooks; in-query training then runs
    over ALL lists' residuals — the index-build scope — never just
    the probed subset, so a skewed or tiny probed list can't starve
    (or crash) the quantizer.
    """
    import math

    from iheardai_data_pipeline_spark.operators.similarity import (
        _assign_to_centroids,
        _collect_centroids,
    )

    qn0 = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    query_vec = [float(x) / qn0 for x in query_vec]
    emb = normalize_rows(embeddings, id_col, vec_col)
    if centroids is not None:
        cent = [(i, [float(x) for x in v]) for i, v in enumerate(centroids)]
    else:
        cent = _collect_centroids(emb, n_centroids, id_col, vec_col, seed_mode)
    if not residual and books is None:
        books = pq_train(
            emb, m=m, k=k_codes, iters=1, id_col=id_col, vec_col=vec_col,
            allow_fewer=True,
        )

    # probe ranking is driver-side over the bounded centroid set
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    def qsim(vec):
        d = sum(float(a) * b for a, b in zip(query_vec, vec))
        return d / (qn * math.sqrt(sum(x * x for x in vec)))
    ranked = sorted(
        ((qsim(vec), i) for i, (_, vec) in enumerate(cent)),
        key=lambda t: (-t[0], t[1]),
    )
    probe_ids = [i for _, i in ranked[:nprobe]]

    assigned = _assign_to_centroids(emb, cent, id_col, vec_col)
    probed = assigned.filter(F.col("centroid_id").isin(probe_ids)).select(
        id_col, vec_col, "centroid_id"
    )
    if residual:
        # v - centroid(v), row-local via a literal centroid matrix
        cents_lit = _cb_literal([v for _, v in cent], "spark")
        res = F.zip_with(
            F.col(vec_col),
            F.expr(f"element_at({cents_lit}, centroid_id + 1)"),
            lambda a, b: a.cast("double") - b,
        )
        res_frame = probed.select(
            F.col(id_col), res.alias(vec_col), "centroid_id"
        )
        if books is None:
            # codebooks learned over ALL lists' residuals — the
            # index-build scope, so a tiny/skewed probed subset can't
            # starve the quantizer (and degrade k rather than raise)
            books = pq_train(
                assigned.select(F.col(id_col), res.alias(vec_col)),
                m=m, k=k_codes, iters=1,
                id_col=id_col, vec_col=vec_col, allow_fewer=True,
            )
        codes = pq_encode(res_frame, books, id_col=id_col, vec_col=vec_col,
                          extra_cols=("centroid_id",))
        # one ADC table per probed list, from the query's own residual
        dsub = len(books[0][0])
        luts = {}
        for l in probe_ids:
            qr = [q - c for q, c in zip(query_vec, cent[l][1])]
            luts[l] = [
                [
                    sum((qr[ss * dsub + t] - cc[t]) ** 2 for t in range(dsub))
                    for cc in books[ss]
                ]
                for ss in range(m)
            ]
        def lut_lit(l):
            return (
                "array(" + ",".join(
                    "array(" + ",".join(f"{x!r}D" for x in row) + ")"
                    for row in luts[l]
                ) + ")"
            )
        branches = " ".join(
            f"WHEN centroid_id = {l} THEN aggregate(zip_with(`codes`, "
            f"sequence(0, {m - 1}), (c, s) -> element_at(element_at("
            f"{lut_lit(l)}, s + 1), c + 1)), CAST(0.0 AS DOUBLE), "
            f"(acc, v) -> acc + v)"
            for l in probe_ids
        )
        dist = F.expr(f"CASE {branches} END")
        cand = codes
        if exclude_id is not None:
            cand = cand.filter(F.col(id_col) != exclude_id)
        short = (
            cand.select(F.col(id_col), dist.alias("adc"))
            .orderBy("adc", id_col)
            .limit(shortlist)
            .select(id_col)
        )
    else:
        codes = pq_encode(probed, books, id_col=id_col, vec_col=vec_col)
        short = pq_adc_topk(
            codes, books, query_vec, k=shortlist, id_col=id_col,
            exclude_id=exclude_id,
        ).select(id_col)
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    l2 = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            qcol,
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        probed.join(short, id_col, "left_semi")
        .select(F.col(id_col), l2.alias("l2_dist"))
        .orderBy("l2_dist", id_col)
        .limit(k)
        .select(id_col, F.round("l2_dist", 6).alias("l2_dist"))
    )
