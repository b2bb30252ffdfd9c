"""Embedding dimensionality-reduction catalog entries (round 6
extension session): JL random projection, exact-integer PCA, the
cluster-pruned kNN graph — the pre-ANN levers a 100 TB embedding
corpus needs before any index build.

Oracle discipline: the two projection entries generate their DuckDB
SQL from the SAME literals (sign matrix / pinned PCA artifact) and the
SAME fold generators the Spark side uses
(operators/embedred.py:jl_project_sql / pca_project_sql), so every
projected double is bit-exact. The co-moment entry is exact BIGINT
arithmetic end-to-end. The JL gate pins the lemma's actual guarantee
(norm preservation) — NOT top-k recall, which isotropic synthetic
data does not preserve at out_dim 16 (measured 0.1-0.3; documented so
nobody mistakes the gate for an ANN recall contract).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.operators import embedred
from iheardai_data_pipeline_spark.plans.catalog import register
from iheardai_data_pipeline_spark.plans.pca_artifact import (
    PCA_COMPONENTS,
    PCA_MU,
    PCA_SCALE,
)
from iheardai_data_pipeline_spark.sources.batch import load_table

_IN_DIM = 64
_JL_DIM = 16
_JL_SEED = "jl-v1"
_JL_SIGNS = embedred.jl_signs(_IN_DIM, _JL_DIM, _JL_SEED)
_JL_SCALE = 1.0 / math.sqrt(_JL_DIM)


def _jl_oracle() -> str:
    # scalar p0..p15 columns, never an array: the driver's canonicalizer
    # sorts on every column and list cells are unhashable (verify-skill
    # gotcha; the r1 a_pctl_approx lesson)
    exprs = ",\n       ".join(
        embedred.jl_project_sql("embedding", _JL_SIGNS[j], _JL_SCALE, "duckdb")
        + f" AS p{j}"
        for j in range(_JL_DIM)
    )
    return f"""
SELECT vec_id, {exprs}
FROM embeddings
WHERE embedding IS NOT NULL
"""


@register(
    "x_embed_random_projection",
    oracle=_jl_oracle(),
    tags=("extension", "embedding"),
    doc="Johnson-Lindenstrauss sign projection 64 -> 16 dims "
    "(Achlioptas 2001): the pre-ANN memory lever — the projection "
    "matrix is a SEED (every worker re-derives the md5-parity ±1 "
    "signs), not shipped state. One narrow projection of 16 generated "
    "left-folds, zero shuffles, no UDF; the DuckDB twin is generated "
    "from the same literals with identical float-op order, so every "
    "coordinate is bit-exact (operators/embedred.py).",
)
def x_embed_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    proj = embedred.jl_project(
        load_table(spark, sf_dir, "embeddings"),
        in_dim=_IN_DIM,
        out_dim=_JL_DIM,
        seed=_JL_SEED,
    )
    # flatten to scalar columns for the driver's hash gate (Catalyst
    # simplifies GetArrayItem(CreateArray) back to the j-th fold)
    return proj.select(
        "vec_id", *[F.col("proj")[j].alias(f"p{j}") for j in range(_JL_DIM)]
    )


# The gate pins the JL lemma's guarantee: E[||Px||^2] = ||x||^2 for the
# scaled sign matrix, with per-row concentration ~ chi^2(out_dim).
# Measured on the pinned data (2026-08): corpus-mean ratio 0.98-1.01
# and in-band [0.5, 1.5] fraction 0.86-0.89 across sf0.001/0.01/0.1;
# the gate's bounds (mean in [0.85, 1.15], in-band >= 0.75) leave wide
# margin yet any scale/sign-matrix defect (wrong sqrt(d) scale shifts
# the mean 2-4x; a degenerate all-+1 matrix collapses the band
# fraction) flips a flag.
#
# Round 10: VALUE-replayed (was a literal-flag oracle). The per-row
# distortion ratio is bit-exact cross-engine (the jl_project_sql fold
# discipline — proven by x_embed_random_projection), so the gate's
# aggregates replay in DuckDB as EXACT integers: each row's ratio is
# frozen to micro-units row-locally (round-half-up(r * 1e6), identical
# double arithmetic both engines), the corpus aggregates are then
# order-independent BIGINT sums, and the flags become exact integer
# comparisons (sum between 850000*n and 1150000*n; 4*band_n >= 3*n).
# The oracle computes n_rows/band_n/sum_r_micro FROM the data — a
# broken scale, sign matrix, or fold diverges in the values, not just
# the flags.


def _jl_gate_ratio_sql(engine: str) -> str:
    """Per-row JL distortion ratio ||Px||^2 / ||x||^2 for one engine,
    as the identical left-fold arithmetic (16-term left-assoc sum of
    squared generated folds over the same literal sign rows)."""
    terms = []
    for j in range(_JL_DIM):
        c = embedred.jl_project_sql(
            "`embedding`" if engine == "spark" else "embedding",
            _JL_SIGNS[j],
            _JL_SCALE,
            engine,
        )
        terms.append(f"(({c}) * ({c}))")
    proj = " + ".join(terms)
    if engine == "spark":
        orig = (
            "aggregate(zip_with(`embedding`, `embedding`, "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    else:
        orig = (
            "list_reduce(list_prepend(0.0::DOUBLE, "
            "list_transform(embedding, x -> "
            "CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (acc, v) -> acc + v)"
        )
    return f"(({proj}) / ({orig}))"


_JL_GATE_ORACLE = f"""
WITH r AS (
  SELECT CAST(floor({_jl_gate_ratio_sql("duckdb")} * 1000000.0 + 0.5) AS BIGINT)
         AS r_micro
  FROM embeddings
  WHERE embedding IS NOT NULL
    AND list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
          (acc, v) -> acc + v) > 0
)
SELECT CAST(16 AS INT) AS jl_dim,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN r_micro BETWEEN 500000 AND 1500000
                     THEN 1 ELSE 0 END) AS BIGINT) AS band_n,
       CAST(sum(r_micro) AS BIGINT) AS sum_r_micro,
       sum(r_micro) BETWEEN 850000 * count(*) AND 1150000 * count(*)
         AS mean_ok,
       4 * sum(CASE WHEN r_micro BETWEEN 500000 AND 1500000
                    THEN 1 ELSE 0 END) >= 3 * count(*) AS band_ok
FROM r
"""


@register(
    "x_embed_jl_norm_gate",
    oracle=_JL_GATE_ORACLE,
    tags=("extension", "embedding", "approximate"),
    doc="JL distortion contract gate (round 10: VALUE-replayed): the "
    "16-dim sign projection must preserve squared norms (corpus-mean "
    "ratio in [0.85, 1.15], >= 75% of rows within [0.5, 1.5]) — the "
    "lemma's actual guarantee, restated in exact per-row micro-units "
    "so the corpus aggregates are order-independent BIGINT sums that "
    "DuckDB recomputes from the data (n_rows, band_n, sum_r_micro all "
    "hash-compared, not just the flags). Deliberately NOT a top-k "
    "recall gate: isotropic 64-dim synthetic data has no low-dim "
    "structure, so neighbor recall at out_dim 16 is ~0.1-0.3 by "
    "measurement and would gate nothing.",
)
def x_embed_jl_norm_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    ratio = F.expr(_jl_gate_ratio_sql("spark"))
    orig_norm = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda a, v: a + v.cast("double") * v.cast("double"),
    )
    r_micro = F.floor(ratio * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    rows = (
        emb.where(orig_norm > 0)
        .select(r_micro.alias("r_micro"))
    )
    in_band = (
        F.col("r_micro").between(500000, 1500000).cast("long")
    )
    agg = rows.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(in_band).alias("band_n"),
        F.sum("r_micro").alias("sum_r_micro"),
    )
    return agg.select(
        F.lit(_JL_DIM).cast("int").alias("jl_dim"),
        "n_rows",
        "band_n",
        "sum_r_micro",
        F.col("sum_r_micro").between(
            850000 * F.col("n_rows"), 1150000 * F.col("n_rows")
        ).alias("mean_ok"),
        (4 * F.col("band_n") >= 3 * F.col("n_rows")).alias("band_ok"),
    )


_PCA_COV_ORACLE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE embedding IS NOT NULL
),
sc AS (
  SELECT max(list_max(list_transform(v, x -> abs(x)))) AS amax FROM e
),
q AS (
  SELECT vec_id,
         CASE WHEN amax > 0
              THEN list_transform(v, x -> CAST(floor(x / (amax / 127.0) + 0.5) AS INT))
              ELSE list_transform(v, x -> 0) END AS qv
  FROM e, sc
),
qx AS (
  SELECT vec_id, CAST(t.i - 1 AS INT) AS i, qv[t.i] AS qq
  FROM q, unnest(generate_series(1, 64)) t(i)
),
mom AS (
  SELECT a.i AS i, b.i AS j,
         CAST(sum(CAST(a.qq AS BIGINT) * b.qq) AS BIGINT) AS sxy,
         CAST(count(*) AS BIGINT) AS n
  FROM qx a JOIN qx b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY 1, 2
),
ds AS (SELECT i, CAST(sum(qq) AS BIGINT) AS s FROM qx GROUP BY i)
SELECT mom.i, mom.j, mom.sxy, sa.s AS si, sb.s AS sj, mom.n
FROM mom JOIN ds sa ON mom.i = sa.i JOIN ds sb ON mom.j = sb.i
"""


@register(
    "x_embed_pca_cov",
    oracle=_PCA_COV_ORACLE,
    tags=("extension", "embedding"),
    doc="PCA index-build half: EXACT-INTEGER co-moment sums (i, j, "
    "sxy, si, sj, n) over globally int8-quantized vectors — quantize "
    "first so every cross-row sum is a BIGINT (partition-order "
    "independent; float sums across rows would hash-drift). The "
    "shuffled relation is d*(d+1)/2 = 2080 cells at ANY corpus size — "
    "what a 1000-executor job ships to the eigensolver, the pq_train "
    "aggregation-state discipline (operators/embedred.py:comoment_sums).",
)
def x_embed_pca_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedred.comoment_sums(
        load_table(spark, sf_dir, "embeddings"), dim=_IN_DIM
    )


def _pca_project_oracle() -> str:
    qsql = embedred.quantize_global_sql("embedding", PCA_SCALE, "duckdb")
    # scalar p0..p7 columns — same no-array-output rule as the JL oracle
    exprs = ",\n       ".join(
        embedred.pca_project_sql("qv", PCA_MU, w_k, "duckdb") + f" AS p{k}"
        for k, w_k in enumerate(PCA_COMPONENTS)
    )
    return f"""
WITH q AS (
  SELECT vec_id, {qsql} AS qv FROM embeddings WHERE embedding IS NOT NULL
)
SELECT vec_id, {exprs} FROM q
"""


@register(
    "x_embed_pca_project",
    oracle=_pca_project_oracle(),
    tags=("extension", "embedding"),
    doc="PCA read-path half: center-and-rotate onto the top-8 pinned "
    "components (plans/pca_artifact.py, trained once at sf0.01 — a "
    "PCA basis is a shipped model artifact, the pq_artifact pattern). "
    "The pinned scale makes quantization row-local, so the whole "
    "projection is one narrow zero-shuffle select; the DuckDB twin is "
    "generated from the same artifact with identical fold order — "
    "bit-exact coordinates at every SF.",
)
def x_embed_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    proj = embedred.pca_project(
        load_table(spark, sf_dir, "embeddings"),
        scale=PCA_SCALE,
        mu=PCA_MU,
        components=PCA_COMPONENTS,
    )
    return proj.select(
        "vec_id",
        *[F.col("proj")[k].alias(f"p{k}") for k in range(len(PCA_COMPONENTS))],
    )


# assign CTEs replicate the proven _IVF_ASSIGN_ORACLE fold arithmetic
# (extension_queries.py) bit-for-bit; pair cosine reuses the
# list_cosine_similarity + round-6 parity rule from x_sim_embedding_dups.
# Ranking happens ON the rounded value in BOTH engines (ties then break
# by neighbor id), so ranks are deterministic and identical.
_KNN_ORACLE = """
WITH cent AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
         embedding::DOUBLE[] AS cvec,
         1.0 / sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
                                (a, b) -> a + b)) AS invn
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)
),
scores AS (
  SELECT e.vec_id, c.cid,
         list_reduce(list_transform(range(1, 65),
             i -> e.embedding[i]::DOUBLE * c.cvec[i]), (a, b) -> a + b) * c.invn AS s
  FROM embeddings e, cent c
),
assign AS (
  SELECT vec_id, cid AS centroid_id FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
    FROM scores
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.vec_id, b.vec_id AS nbr_id,
         round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                      eb.embedding::DOUBLE[]), 6) AS sim
  FROM assign a
  JOIN assign b ON a.centroid_id = b.centroid_id AND a.vec_id <> b.vec_id
  JOIN embeddings ea ON a.vec_id = ea.vec_id
  JOIN embeddings eb ON b.vec_id = eb.vec_id
)
SELECT vec_id, nbr_id, CAST(rank AS INT) AS rank, sim FROM (
  SELECT vec_id, nbr_id, sim,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nbr_id ASC) AS rank
  FROM pairs
)
WHERE rank <= 5
"""


@register(
    "x_embed_knn_graph",
    oracle=_KNN_ORACLE,
    tags=("extension", "embedding", "graph"),
    doc="Cluster-pruned exact kNN graph (k=5 within IVF cells, "
    "deterministic seed centroids): the blocking that turns all-pairs "
    "O(n^2) into O(sum |cell|^2) — with the sqrt(N) centroid rule "
    "that is O(n^1.5) and each cell independent, the SemDeDup-scale "
    "shape every graph consumer here (components/k-core/triangles) "
    "feeds on. Cosine rounded to 6 dp BEFORE ranking so both engines "
    "rank identical values; full value oracle "
    "(operators/embedred.py:knn_graph).",
)
def x_embed_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedred.knn_graph(
        load_table(spark, sf_dir, "embeddings"), k=5, n_centroids=16
    )


# Same proven cent/scores CTEs; assignment keeps rn <= 2 (top-2 cells,
# ties s DESC then cid ASC — identical to the struct-sort key on the
# Spark side), candidates are DISTINCT pairs sharing any cell.
_KNN_MP_ORACLE = """
WITH cent AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
         embedding::DOUBLE[] AS cvec,
         1.0 / sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
                                (a, b) -> a + b)) AS invn
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)
),
scores AS (
  SELECT e.vec_id, c.cid,
         list_reduce(list_transform(range(1, 65),
             i -> e.embedding[i]::DOUBLE * c.cvec[i]), (a, b) -> a + b) * c.invn AS s
  FROM embeddings e, cent c
),
assign AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
    FROM scores
  ) WHERE rn <= 2
),
pairs AS (
  SELECT DISTINCT a.vec_id, b.vec_id AS nbr_id
  FROM assign a
  JOIN assign b ON a.cell = b.cell AND a.vec_id <> b.vec_id
),
scored AS (
  SELECT p.vec_id, p.nbr_id,
         round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                      eb.embedding::DOUBLE[]), 6) AS sim
  FROM pairs p
  JOIN embeddings ea ON p.vec_id = ea.vec_id
  JOIN embeddings eb ON p.nbr_id = eb.vec_id
)
SELECT vec_id, nbr_id, CAST(rank AS INT) AS rank, sim FROM (
  SELECT vec_id, nbr_id, sim,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nbr_id ASC) AS rank
  FROM scored
)
WHERE rank <= 5
"""


@register(
    "x_embed_knn_multiprobe",
    oracle=_KNN_MP_ORACLE,
    tags=("extension", "embedding", "graph"),
    doc="Multi-assignment kNN graph (top-2 cells per vector, k=5): the "
    "standard lever against single-probe cell-boundary recall loss — "
    "candidates are pairs sharing ANY of their probed cells, so true "
    "neighbors split by a boundary are found through the second cell "
    "at ~nprobe^2 pair cost (documented, bounded, never all-pairs). "
    "Measured recall@5 vs the exact all-pairs answer on the pinned "
    "data: 0.19-0.20 single-probe -> 0.47-0.50 at nprobe=2 "
    "(sf0.01/sf0.1; isotropic vectors are the WORST case for cell "
    "pruning — clustered real embeddings fare far better). Full value "
    "oracle with the same rank-on-rounded-cosine parity as "
    "x_embed_knn_graph (operators/embedred.py:knn_graph_multiprobe).",
)
def x_embed_knn_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedred.knn_graph_multiprobe(
        load_table(spark, sf_dir, "embeddings"), k=5, n_centroids=16, nprobe=2
    )
