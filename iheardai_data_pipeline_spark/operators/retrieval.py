"""Hybrid-retrieval fusion: combine rankings from heterogeneous
retrieval systems (lexical BM25, embedding cosine, phrase, ANN serve)
into one list per query.

Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
``score(d) = sum over systems s of 1 / (K + rank_s(d))`` with the
canonical K=60. Rank-based fusion needs NO score calibration between
systems — exactly why it is the standard first fuse for BM25 +
vector search.

Determinism discipline: each contribution is computed in EXACT integer
arithmetic — ``1_000_000 div (K + rank)`` (integral division, not a
float reciprocal) — so the per-(query, doc) sum is order-independent
and every engine replays it bit-for-bit with zero float discipline.
The scale constant trades precision for exactness: two fused scores
differing by less than ~1e-6 of an RRF unit collapse to a tie, which
the doc-id tiebreaker then resolves deterministically (documented
convention, mirrored by the oracle).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RRF_K = 60
RRF_SCALE = 1_000_000


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 5,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rnk",
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Fuse per-query rankings into a top-k by Reciprocal Rank Fusion.

    Each input carries (query_id, doc_id, rnk) — any extra columns are
    ignored. A (query, doc) absent from a system simply contributes
    nothing (the standard RRF convention). Output: (query_id, doc_id,
    rrf_micro, n_systems, rnk) with rrf_micro the exact integer sum of
    ``RRF_SCALE div (rrf_k + rank)`` contributions and n_systems the
    number of systems that ranked the pair.

    Shape: one union of the (already tiny — top-K per query per
    system) ranking frames, one partial-agg groupBy, one per-query
    window. The fusion itself never touches the corpus; its inputs'
    cost is each system's own serve.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    from pyspark.sql import Window

    parts = [
        r.select(
            F.col(query_id_col),
            F.col(id_col),
            F.expr(
                f"CAST({RRF_SCALE} DIV ({rrf_k} + {rank_col}) AS BIGINT)"
            ).alias("c"),
        )
        for r in rankings
    ]
    contrib = reduce(lambda a, b: a.unionByName(b), parts)
    fused = contrib.groupBy(query_id_col, id_col).agg(
        F.sum("c").alias("rrf_micro"),
        F.count(F.lit(1)).alias("n_systems"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("rrf_micro"), F.asc(id_col)
    )
    return (
        fused.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "rrf_micro", "n_systems", "rnk")
    )
