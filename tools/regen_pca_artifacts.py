"""Regenerate the pinned PCA artifact (``plans/pca_artifact.py``) from
the sf0.01 embeddings table.

Why ONE artifact (not per-SF): a PCA basis is a shipped model artifact
— a fixed linear map trained once on a sample and applied to any
corpus, exactly like ``plans/pq_artifact.py``'s encode codebooks. The
``x_embed_pca_project`` read path and its generated DuckDB oracle both
embed these literals, so the projection is bit-exact at every SF.

Derivation is pure numpy over the EXACT integer co-moments the engine
itself computes (operators/embedred.py:comoment_sums semantics):
globally-scaled int8 quantization -> BIGINT second moments ->
covariance -> eigh -> top components, each sign-fixed so its
largest-|w| element is positive (first index on ties) — a total
deterministic function of the table bytes.

    python tools/regen_pca_artifacts.py [sf_dir=/root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

N_COMPONENTS = 8

HEADER = '''"""Pinned PCA projection artifact (GENERATED — do not edit;
regenerate with tools/regen_pca_artifacts.py after testdata changes).

Trained once on the sf0.01 embeddings (the pq_artifact pattern: a PCA
basis is a fixed shipped linear map, applied unchanged at every SF).
All three constants feed BOTH the Spark read path
(operators/embedred.py:pca_project) and the generated DuckDB oracle,
so projected coordinates are bit-exact across engines:

- PCA_SCALE:      the global int8 quantization step (amax/127) —
                  pinned so the read path quantizes row-locally with
                  zero aggregations.
- PCA_MU:         per-dimension mean of the quantized values.
- PCA_COMPONENTS: top-%d eigenvectors of the quantized covariance
                  (eigenvalue-descending; each sign-fixed: largest-|w|
                  element positive, first index on ties).
"""

''' % N_COMPONENTS


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT embedding::DOUBLE[] FROM read_parquet('{sf_dir}/embeddings.parquet') "
        "WHERE embedding IS NOT NULL ORDER BY vec_id"
    ).fetchall()
    v = np.array([r[0] for r in rows], dtype=np.float64)
    amax = float(np.max(np.abs(v)))
    scale = amax / 127.0
    q = np.floor(v / scale + 0.5).astype(np.int64)
    n = q.shape[0]
    si = q.sum(axis=0)
    sxy = q.T @ q
    cov = (n * sxy - np.outer(si, si)).astype(np.float64) / float(n) ** 2
    mu = si.astype(np.float64) / float(n)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:N_COMPONENTS]
    comps = []
    for idx in order:
        w = vecs[:, idx].copy()
        if w[int(np.argmax(np.abs(w)))] < 0:
            w = -w
        comps.append([float(x) for x in w])

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "iheardai_data_pipeline_spark",
        "plans",
        "pca_artifact.py",
    )
    with open(out, "w") as f:
        f.write(HEADER)
        f.write(f"PCA_SCALE = {scale!r}\n\n")
        f.write(f"PCA_MU = {[float(x) for x in mu]!r}\n\n")
        f.write(f"PCA_COMPONENTS = {comps!r}\n")
    print(f"wrote {out}: scale={scale!r}, {N_COMPONENTS} components over dim {v.shape[1]}")


if __name__ == "__main__":
    main()
