"""Scalable IVF: hash seeding, the sqrt(N) sizing rule, and the
broadcast-matrix argmax for large centroid counts — all must agree with
the literal-expression path bit-for-bit and keep recall at large k."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.operators import similarity as S


def _clustered_embeddings(spark, n_clusters=80, per_cluster=50, dim=16):
    """Deterministic clustered corpus: cluster c's members are the unit
    direction of axis (c % dim) plus a small deterministic wobble."""
    n = n_clusters * per_cluster
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % n_clusters).alias("c"),
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            F.when(d == (F.col("c") % dim).cast("int"), F.lit(10.0)).otherwise(F.lit(0.0))
            + F.pmod(F.xxhash64(F.col("vec_id"), d), F.lit(97)).cast("double") / 97.0
        ),
    )
    return base.select("vec_id", vec.alias("embedding"))


def test_broadcast_argmax_equals_literal(spark):
    emb = _clustered_embeddings(spark, n_clusters=12, per_cluster=20)
    cent = S._collect_centroids(emb, 12, "vec_id", "embedding", "hash")
    vecs = [v for _, v in cent]
    lit = S._with_centroid_id(emb, vecs, "embedding", "cid")
    # force the broadcast path for the SAME centroid set
    old = S._LITERAL_ARGMAX_MAX_CENTROIDS
    S._LITERAL_ARGMAX_MAX_CENTROIDS = 0
    try:
        bc = S._with_centroid_id(emb, vecs, "embedding", "cid")
    finally:
        S._LITERAL_ARGMAX_MAX_CENTROIDS = old
    a = {r["vec_id"]: r["cid"] for r in lit.select("vec_id", "cid").collect()}
    b = {r["vec_id"]: r["cid"] for r in bc.select("vec_id", "cid").collect()}
    assert a == b and len(a) == 240


def test_hash_seeding_is_deterministic_and_spread(spark):
    emb = _clustered_embeddings(spark, n_clusters=40, per_cluster=25)
    c1 = S._collect_centroids(emb, 16, "vec_id", "embedding", "hash")
    c2 = S._collect_centroids(emb, 16, "vec_id", "embedding", "hash")
    assert c1 == c2
    # "first" takes ids 0..15 (16 distinct clusters at best from the
    # first ids); the hash sample must NOT be the id prefix
    first = S._collect_centroids(emb, 16, "vec_id", "embedding", "first")
    assert {i for i, _ in first} == set(range(16))
    assert {i for i, _ in c1} != set(range(16))


def test_sqrt_rule(spark):
    emb = _clustered_embeddings(spark, n_clusters=10, per_cluster=10)  # N=100
    assert S.resolve_n_centroids(emb, None) == 16  # clamp floor
    assert S.resolve_n_centroids(emb, 5) == 5
    big = spark.range(40_000).select(
        F.col("id").alias("vec_id"), F.array(F.lit(1.0)).alias("embedding")
    )
    assert S.resolve_n_centroids(big, None) == 200


def test_large_k_ivf_recall(spark):
    """80 hash-seeded centroids (> the 64 literal cap, so the broadcast
    argmax path runs end-to-end): IVF top-10 must recover >= 8 of the
    exact brute-force top-10 on clustered data."""
    emb = _clustered_embeddings(spark, n_clusters=80, per_cluster=50)
    row = emb.filter(F.col("vec_id") == 0).first()
    q = [float(x) for x in row["embedding"]]
    approx = S.ivf_topk(
        emb, q, k=10, n_centroids=80, nprobe=8, exclude_id=0, seed_mode="hash"
    )
    exact = S.cosine_topk_bruteforce(emb, q, k=10, exclude_id=0)
    hits = (
        approx.select("vec_id")
        .join(exact.select("vec_id"), "vec_id", "left_semi")
        .count()
    )
    assert hits >= 8
