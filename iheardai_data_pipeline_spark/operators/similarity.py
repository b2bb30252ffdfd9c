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
    """Brute-force cosine top-k against a literal query vector."""
    q = vector_literal(query_vec)
    sim = cosine_similarity(F.col(vec_col), q)
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
) -> DataFrame:
    """Near-duplicate embedding pairs: cosine >= threshold within a
    blocking key (equi-join on the block column — never a cross join)."""
    left = embeddings.select(
        F.col(block_col), F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")
    )
    right = embeddings.select(
        F.col(block_col), F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")
    )
    sim = cosine_similarity(F.col("vec_a"), F.col("vec_b"))
    return (
        left.join(right, block_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select(block_col, "id_a", "id_b", F.round("sim", 6).alias("sim"))
        .orderBy(block_col, "id_a", "id_b")
    )


def ivf_assign(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF index build: centroids = the first n_centroids vectors by id
    (deterministic seed set), every vector assigned to its max-cosine
    centroid. Returns (centroids, assigned).

    A production build would run k-means refinement; the partition/probe
    machinery — the Spark-side part — is identical.
    """
    centroids = (
        embeddings.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.monotonically_increasing_id().alias("centroid_tmp"),
            F.col(id_col).alias("centroid_src"),
            F.col(vec_col).alias("centroid_vec"),
        )
    )
    # stable centroid ids from source ids (monotonic id is partition-dependent)
    from pyspark.sql import Window

    w = Window.orderBy("centroid_src")
    centroids = centroids.select(
        (F.row_number().over(w) - 1).alias("centroid_id"), "centroid_src", "centroid_vec"
    )
    sim = cosine_similarity(F.col(vec_col), F.col("centroid_vec"))
    scored = embeddings.crossJoin(F.broadcast(centroids)).withColumn("csim", sim)
    w2 = Window.partitionBy(id_col).orderBy(F.desc("csim"), "centroid_id")
    assigned = (
        scored.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, "centroid_id")
    )
    return centroids, assigned


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe the nprobe centroids nearest to the
    query, brute-force only their inverted lists."""
    centroids, assigned = ivf_assign(embeddings, n_centroids, id_col, vec_col)
    q = vector_literal(query_vec)
    probe_ids = [
        r["centroid_id"]
        for r in centroids.withColumn("qsim", cosine_similarity(F.col("centroid_vec"), q))
        .orderBy(F.desc("qsim"), "centroid_id")
        .limit(nprobe)
        .collect()
    ]
    candidates = assigned.filter(F.col("centroid_id").isin(probe_ids))
    if exclude_id is not None:
        candidates = candidates.filter(F.col(id_col) != exclude_id)
    sim = cosine_similarity(F.col(vec_col), q)
    return (
        candidates.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), id_col)
        .limit(k)
        .select(id_col, F.round(F.col("sim"), 6).alias("sim"))
    )
