"""Hybrid-retrieval fusion: combine rankings from heterogeneous
retrieval systems (lexical BM25, embedding cosine, phrase, ANN serve)
into one list per query.

Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
``score(d) = sum over systems s of 1 / (K + rank_s(d))`` with the
canonical K=60. Rank-based fusion needs NO score calibration between
systems — exactly why it is the standard first fuse for BM25 +
vector search.

Convex (weighted score-interpolation) fusion — the OTHER standard
hybrid shape (round 13): ``score(d) = sum over systems s of w_s *
minmax_s(score_s(d))`` with per-query min-max normalization bringing
each system's scores onto [0, 1] before the weighted sum. Rank fusion
discards score GAPS; convex fusion keeps them — a doc that wins its
system by a mile beats one that wins by a hair — at the price of
needing score-comparable inputs, which the normalization supplies.

Determinism discipline (both fusers): every contribution is computed
in EXACT integer arithmetic — RRF as ``1_000_000 div (K + rank)``,
convex as ``((s - min) * 1_000_000) div (max - min)`` micro-units
times a milli weight — integral division on BIGINTs, never a float
reciprocal, so the per-(query, doc) sum is order-independent and
every engine replays it bit-for-bit with zero float discipline. The
scale constants trade precision for exactness: fused scores closer
than one integer unit collapse to a tie, which the doc-id tiebreaker
then resolves deterministically (documented convention, mirrored by
the oracle).
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


def convex_fuse(
    legs: list[tuple[DataFrame, int]],
    k: int = 5,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "score_int",
) -> DataFrame:
    """Fuse per-query scored lists by WEIGHTED SCORE INTERPOLATION:
    ``alpha * minmax(bm25) + (1 - alpha) * minmax(semantic)`` — the
    production hybrid-search shape that keeps score gaps (RRF throws
    them away). ``legs`` = [(frame, weight_milli), ...] with integer
    milli weights summing to 1000; each frame carries (query_id,
    doc_id, score_int) where ``score_int`` is that system's EXACT
    integer score, higher better (BM25's score_micro verbatim; a
    distance becomes ``-floor(dist * 1e6)``).

    Per leg and per query: norm = ((s - min) * 1_000_000) DIV
    (max - min) over the leg's OWN rows — integral division on
    BIGINTs, and 1_000_000 flat when the leg's scores all tie (the
    degenerate-range convention, mirrored by the oracle). The fused
    value is the exact integer ``sum of w_milli * norm`` (nano units
    of the convex score in [0, 1]); a (query, doc) absent from a leg
    contributes nothing from it. Ties break doc_id asc.

    Shape: the leg frames are top-K-per-query small; two analytic
    windows per leg, one union, one partial-agg groupBy, one ranking
    window — the fusion never touches the corpus."""
    if not legs:
        raise ValueError("convex_fuse needs at least one leg")
    total = sum(w for _, w in legs)
    if total != 1000 or any(
        (not isinstance(w, int)) or w <= 0 for _, w in legs
    ):
        raise ValueError(
            "convex_fuse weights must be positive integer milli-units "
            f"summing to 1000; got {[w for _, w in legs]}"
        )
    from pyspark.sql import Window

    wq = Window.partitionBy(query_id_col)
    parts = []
    for frame, w_milli in legs:
        d = (
            frame.select(
                F.col(query_id_col),
                F.col(id_col),
                F.col(score_col).cast("long").alias("__s"),
            )
            .withColumn("__mx", F.max("__s").over(wq))
            .withColumn("__mn", F.min("__s").over(wq))
        )
        norm = F.when(
            F.col("__mx") == F.col("__mn"), F.lit(1_000_000).cast("long")
        ).otherwise(
            F.expr("((__s - __mn) * CAST(1000000 AS BIGINT)) DIV (__mx - __mn)")
        )
        parts.append(
            d.select(
                query_id_col,
                id_col,
                (norm * F.lit(int(w_milli))).cast("long").alias("c"),
            )
        )
    contrib = reduce(lambda a, b: a.unionByName(b), parts)
    fused = contrib.groupBy(query_id_col, id_col).agg(
        F.sum("c").alias("convex_nano"),
        F.count(F.lit(1)).alias("n_systems"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("convex_nano"), F.asc(id_col)
    )
    return (
        fused.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "convex_nano", "n_systems", "rnk")
    )
