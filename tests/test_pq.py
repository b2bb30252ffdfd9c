"""Product quantization: training determinism, encode properties, ADC
ordering, and the cross-engine bit-exactness the generated fold
guarantees."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.operators import pq


def _emb(spark, n=60, dim=16):
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.pmod(F.xxhash64(F.col("vec_id"), d), F.lit(1000)).cast("double")
        / 1000.0,
    )
    return spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))


def test_train_shapes_and_determinism(spark):
    emb = _emb(spark)
    b1 = pq.pq_train(emb, m=4, k=8, iters=1)
    b2 = pq.pq_train(emb, m=4, k=8, iters=1)
    assert b1 == b2
    assert len(b1) == 4 and len(b1[0]) == 8 and len(b1[0][0]) == 4


def test_encode_codes_in_range_and_nearest(spark):
    emb = _emb(spark)
    books = pq.pq_train(emb, m=4, k=8, iters=1)
    rows = pq.pq_encode(emb, books).collect()
    assert len(rows) == 60
    vecs = {r["vec_id"]: r for r in emb.collect()}
    for r in rows:
        assert all(0 <= c < 8 for c in r["codes"])
    # spot-check argmin against plain python for one row
    r = rows[0]
    v = [float(x) for x in vecs[r["vec_id"]]["embedding"]]
    for s in range(4):
        sub = v[s * 4 : (s + 1) * 4]
        dists = [
            sum((a - b) ** 2 for a, b in zip(sub, c)) for c in books[s]
        ]
        assert r["codes"][s] == dists.index(min(dists))


def test_encode_matches_duckdb_bit_exactly(spark):
    emb = _emb(spark)
    books = pq.pq_train(emb, m=4, k=8, iters=1)
    sp = {r["vec_id"]: list(r["codes"]) for r in pq.pq_encode(emb, books).collect()}
    pdf = emb.toPandas()
    con = duckdb.connect()
    con.register("embeddings", pdf)
    cols = ", ".join(
        pq.subspace_code_sql("embedding", s, cb, "duckdb") + f" AS c{s}"
        for s, cb in enumerate(books)
    )
    rows = con.execute(f"SELECT vec_id, {cols} FROM embeddings").fetchall()
    dd = {r[0]: list(r[1:]) for r in rows}
    assert sp == dd


def test_broadcast_codes_match_literal_path_bit_exactly(spark):
    """The round-15 broadcast-DATA codebook path must produce the same
    argmin codes, bit for bit, as the literal expression tree it
    replaced (same left fold from 0.0, same tie-break — only where the
    doubles come from changes)."""
    from iheardai_data_pipeline_spark.sources.batch import eval_once

    emb = _emb(spark, n=80)
    books = pq.pq_train(emb, m=4, k=8, iters=1)
    m = len(books)
    lit = {
        r["vec_id"]: [r[f"__c{s}"] for s in range(m)]
        for r in eval_once(
            emb, **pq._spark_code_cols(books, "embedding")
        ).collect()
    }
    bc = {
        r["vec_id"]: [r[f"__c{s}"] for s in range(m)]
        for r in pq.with_pq_codes(emb, books, "embedding").collect()
    }
    assert lit == bc


def test_adc_orders_by_lookup_distance(spark):
    emb = _emb(spark)
    books = pq.pq_train(emb, m=4, k=8, iters=1)
    codes = pq.pq_encode(emb, books)
    row = emb.orderBy("vec_id").first()
    q = [float(x) for x in row["embedding"]]
    top = pq.pq_adc_topk(codes, books, q, k=5, exclude_id=row["vec_id"]).collect()
    assert len(top) == 5
    dists = [r["adc_dist"] for r in top]
    assert dists == sorted(dists)
    assert all(r["vec_id"] != row["vec_id"] for r in top)


def test_train_rejects_bad_shapes(spark):
    emb = _emb(spark, n=5)
    with pytest.raises(ValueError, match="divisible"):
        pq.pq_train(emb, m=5, k=4, iters=0)
    with pytest.raises(ValueError, match="need >="):
        pq.pq_train(emb, m=4, k=16, iters=0)


def test_residual_ivfpq_beats_raw_at_small_shortlist(spark):
    """Residual quantization spends the 4-bit codebooks on what IVF did
    not already explain, so with a tight shortlist it must recall at
    least as much as raw-vector ADC (and beat it on clustered data)."""
    emb = _emb(spark, n=800, dim=16)
    row = emb.orderBy("vec_id").first()
    q = [float(x) for x in row["embedding"]]
    from iheardai_data_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    exact = {
        r["vec_id"]
        for r in cosine_topk_bruteforce(emb, q, k=10, exclude_id=0).collect()
    }

    def recall(residual):
        got = {
            r["vec_id"]
            for r in pq.ivfpq_search(
                emb,
                q,
                k=10,
                n_centroids=8,
                nprobe=3,
                m=4,
                k_codes=8,
                shortlist=40,
                exclude_id=0,
                residual=residual,
            ).collect()
        }
        return len(got & exact)

    assert recall(True) >= recall(False)
    assert recall(True) >= 5


def test_ivfpq_excludes_zero_norm_rows(spark):
    """An all-zero embedding has no direction: it must be excluded, not
    NaN-poison its assignment and every distance (round-5 ADVICE)."""
    emb = _emb(spark, n=40, dim=16).unionByName(
        spark.range(1).select(
            (F.col("id") + 1000).alias("vec_id"),
            F.array(*[F.lit(0.0)] * 16).alias("embedding"),
        )
    )
    row = emb.orderBy("vec_id").first()
    q = [float(x) for x in row["embedding"]]
    got = pq.ivfpq_search(
        emb, q, k=40, n_centroids=4, nprobe=4, m=4, k_codes=8,
        shortlist=40, exclude_id=0,
    ).collect()
    ids = {r["vec_id"] for r in got}
    assert 1000 not in ids
    assert all(r["l2_dist"] == r["l2_dist"] for r in got)  # no NaN
    assert len(ids) > 0


def test_residual_search_degrades_k_codes_on_tiny_corpus(spark):
    """k_codes > available vectors must degrade, not raise: the residual
    books train at index-build scope over ALL lists (round-5 ADVICE)."""
    emb = _emb(spark, n=10, dim=16)
    row = emb.orderBy("vec_id").first()
    q = [float(x) for x in row["embedding"]]
    got = pq.ivfpq_search(
        emb, q, k=5, n_centroids=2, nprobe=1, m=4, k_codes=16,
        shortlist=8, exclude_id=0, residual=True,
    ).collect()
    assert len(got) > 0


def test_ivfpq_pinned_artifacts_match_in_query_training(spark):
    """centroids/books injected from an artifact must reproduce the
    in-query-trained answer exactly (same normalized-vector pipeline)."""
    import math

    emb = _emb(spark, n=200, dim=16)
    row = emb.orderBy("vec_id").first()
    q = [float(x) for x in row["embedding"]]

    # replicate the search path's normalization (left-associated fold)
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    normed = []
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        acc = 0.0
        for x in v:
            acc = acc + x * x
        n = math.sqrt(acc)
        normed.append((r["vec_id"], [x / n for x in v]))
    cents = [v for _, v in normed[:4]]  # seed_mode="first"
    normed_df = spark.createDataFrame(
        normed, "vec_id long, embedding array<double>"
    )
    books = pq.pq_train(normed_df, m=4, k=8, iters=1, allow_fewer=True)

    kw = dict(k=10, n_centroids=4, nprobe=2, m=4, k_codes=8,
              shortlist=40, exclude_id=0)
    trained = pq.ivfpq_search(emb, q, **kw).collect()
    pinned = pq.ivfpq_search(emb, q, centroids=cents, books=books, **kw).collect()
    assert [r["vec_id"] for r in pinned] == [r["vec_id"] for r in trained]
