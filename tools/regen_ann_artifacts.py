"""Regenerate the pinned per-SF ANN index artifacts
(``plans/ann_artifact.py``): PQ codebooks, IVF centroids, and residual
PQ codebooks for every testdata scale factor.

Why pinned: a quantizer/centroid set is a SHIPPED index artifact — the
production ANN read path loads it, it does not re-run Lloyd training
per query. The recall-gate catalog entries therefore measure the search
path (assign -> prune -> ADC -> re-rank), and the oracle replays
identical arithmetic. Run this after any testdata regeneration:

    python tools/regen_ann_artifacts.py [sf_root=/root/testdata]

Training replicates the in-query path exactly (same normalization, same
deterministic seeds), so pinned-vs-in-query results are bit-identical
at the SFs trained here and UNKNOWN SFs transparently fall back to
in-query training (the artifact dicts just miss the key).
"""

from __future__ import annotations

import os
import sys

HEADER = '''"""Pinned per-SF ANN index artifacts (GENERATED — do not edit;
regenerate with tools/regen_ann_artifacts.py after testdata changes).

Keyed by the sf directory basename ("sf0.01", ...). Four artifact
families, all trained by the same deterministic pipeline the queries
use in their no-artifact fallback:

- PQ_RAW_BOOKS:   pq_train(raw embeddings, m=8, k=16, iters=1) — the
                  x_sim_pq_recall gate's quantizer (raw-vector ADC).
- IVF_CENTROIDS:  first-16-by-id seed centroids over the NORMALIZED
                  vectors (pq.normalize_rows) — ivfpq_search's list
                  structure.
- IVFPQ_BOOKS:    pq_train(normalized, m=8, k=16, iters=1) — the
                  non-residual IVF-PQ quantizer.
- IVFPQ_RESIDUAL_BOOKS: pq_train over ALL lists' residuals
                  (v - centroid(v), normalized space) — the residual
                  refinement quantizer; valid ONLY with the pinned
                  IVF_CENTROIDS above.
"""

'''


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    from iheardai_data_pipeline_spark.operators import pq
    from iheardai_data_pipeline_spark.operators.similarity import (
        _assign_to_centroids,
        _collect_centroids,
    )
    from iheardai_data_pipeline_spark.sources.batch import load_table

    raw_books: dict = {}
    centroids: dict = {}
    ivfpq_books: dict = {}
    res_books: dict = {}
    for sf in sorted(os.listdir(root)):
        d = os.path.join(root, sf)
        if not os.path.isdir(d) or not os.path.exists(
            os.path.join(d, "embeddings.parquet")
        ):
            continue
        emb = load_table(spark, d, "embeddings").where(
            F.col("embedding").isNotNull()
        )
        print(f"{sf}: {emb.count()} vectors")
        raw_books[sf] = pq.pq_train(emb, m=8, k=16, iters=1)
        normed = pq.normalize_rows(emb)
        cent = _collect_centroids(normed, 16, "vec_id", "embedding", "first")
        centroids[sf] = [v for _, v in cent]
        ivfpq_books[sf] = pq.pq_train(normed, m=8, k=16, iters=1)
        assigned = _assign_to_centroids(normed, cent, "vec_id", "embedding")
        cents_lit = pq._cb_literal(centroids[sf], "spark")
        res = F.zip_with(
            F.col("embedding"),
            F.expr(f"element_at({cents_lit}, centroid_id + 1)"),
            lambda a, b: a.cast("double") - b,
        )
        res_books[sf] = pq.pq_train(
            assigned.select(F.col("vec_id"), res.alias("embedding")),
            m=8,
            k=16,
            iters=1,
            allow_fewer=True,
        )

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "iheardai_data_pipeline_spark",
        "plans",
        "ann_artifact.py",
    )
    with open(out, "w") as fh:
        fh.write(HEADER)
        for name, obj in (
            ("PQ_RAW_BOOKS", raw_books),
            ("IVF_CENTROIDS", centroids),
            ("IVFPQ_BOOKS", ivfpq_books),
            ("IVFPQ_RESIDUAL_BOOKS", res_books),
        ):
            fh.write(f"{name} = {obj!r}\n\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
