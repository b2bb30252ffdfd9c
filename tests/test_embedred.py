"""Unit tests for operators/embedred.py (JL projection, exact-integer
PCA moments, pinned-artifact projection, cluster-pruned kNN graph) and
operators/dedup.py:containment_pairs."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.operators import embedred
from iheardai_data_pipeline_spark.operators.dedup import containment_pairs


def test_jl_signs_deterministic_and_pm1():
    a = embedred.jl_signs(8, 4, "seed-x")
    b = embedred.jl_signs(8, 4, "seed-x")
    c = embedred.jl_signs(8, 4, "seed-y")
    assert a == b
    assert a != c  # a different seed must change the matrix
    assert all(v in (1.0, -1.0) for row in a for v in row)


def test_jl_project_matches_python_left_fold(spark):
    vec = [0.5, -1.25, 2.0, 0.125]
    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<float>")
    out = embedred.jl_project(df, in_dim=4, out_dim=2, seed="t").collect()[0]
    signs = embedred.jl_signs(4, 2, "t")
    scale = 1.0 / math.sqrt(2)
    for j in range(2):
        acc = 0.0
        for x, s in zip(vec, signs[j]):
            acc = acc + float(x) * s  # same left-associated order
        assert out["proj"][j] == acc * scale


def test_comoment_sums_exact_tiny(spark):
    # two 2-dim vectors; amax = 127 -> scale = 1.0 -> q == round(v)
    df = spark.createDataFrame(
        [(1, [127.0, 2.0]), (2, [-3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {
        (r["i"], r["j"]): r
        for r in embedred.comoment_sums(df, dim=2).collect()
    }
    assert rows[(0, 0)]["sxy"] == 127 * 127 + 9
    assert rows[(0, 1)]["sxy"] == 127 * 2 + (-3) * 4
    assert rows[(1, 1)]["sxy"] == 4 + 16
    assert rows[(0, 1)]["si"] == 124 and rows[(0, 1)]["sj"] == 6
    assert all(r["n"] == 2 for r in rows.values())


def test_pca_project_identity_components(spark):
    # identity "components" with mu=0 and scale=1 -> proj == q == round(v)
    df = spark.createDataFrame(
        [(7, [1.4, -2.6])], "vec_id long, embedding array<float>"
    )
    out = embedred.pca_project(
        df, scale=1.0, mu=[0.0, 0.0], components=[[1.0, 0.0], [0.0, 1.0]]
    ).collect()[0]
    # round-half-up on the DOUBLE value: 1.4 -> 1, -2.6 -> -3
    assert out["proj"] == [1.0, -3.0]


def test_knn_graph_ranks_within_cluster(spark):
    # seed centroids = first 2 ids: id 1 anchors the x-direction
    # cluster, id 2 the orthogonal z-direction singleton — the split is
    # deterministic. The singleton has no same-cluster peer -> no rows.
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0]),
        (3, [0.9, 0.1, 0.0]),
        (4, [0.8, 0.2, 0.0]),
        (5, [0.7, 0.3, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = embedred.knn_graph(df, k=2, n_centroids=2)
    got = {(r["vec_id"], r["rank"]): r["nbr_id"] for r in out.collect()}
    # nearest neighbor of 1 is 3 (cos ~0.994), then 4
    assert got[(1, 1)] == 3 and got[(1, 2)] == 4
    assert (2, 1) not in got  # singleton cluster has no neighbors
    # ranks are dense from 1 and bounded by k
    assert all(rk in (1, 2) for (_, rk) in got)


def test_knn_graph_tie_breaks_by_neighbor_id(spark):
    # 2 and 3 are IDENTICAL vectors -> equal rounded sim to 1; the tie
    # must break to the lower neighbor id in rank order.
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.5, 0.5]),
        (3, [0.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = embedred.knn_graph(df, k=2, n_centroids=1)
    got = {(r["vec_id"], r["rank"]): r["nbr_id"] for r in out.collect()}
    assert got[(1, 1)] == 2 and got[(1, 2)] == 3


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_detects_quote_regardless_of_position(spark):
    base = "alpha beta gamma delta epsilon zeta"  # 2 5-gram shingles
    long_doc = "one two three four five " + base + " six seven eight nine ten"
    out = containment_pairs(
        _docs(spark, [(1, base), (2, long_doc)]), n=5, threshold=0.8
    ).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["containment"] for r in out}
    # every shingle of doc 1 appears in doc 2 -> containment 1.0
    assert pairs[(1, 2)] == 1.0
    # but doc 2 is NOT contained in doc 1 (directional)
    assert (2, 1) not in pairs


def test_containment_exact_integer_boundary(spark):
    # doc 1 has exactly 5 shingles, 4 shared with doc 2 -> 4/5 = 0.8
    # qualifies at threshold 0.8 ONLY with exact arithmetic (a float
    # ceil(0.8*5)=4.0000000000000001-style error would demand 5).
    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9"  # shingles at positions 1..5
    b = "w1 w2 w3 w4 w5 w6 w7 w8 zz"  # shares shingles 1..4, not 5
    out = containment_pairs(_docs(spark, [(1, a), (2, b)]), n=5, threshold=0.8)
    pairs = {(r["doc_a"], r["doc_b"]): r["containment"] for r in out.collect()}
    assert pairs.get((1, 2)) == 0.8


def test_containment_below_threshold_excluded(spark):
    a = "w1 w2 w3 w4 w5 w6 w7 w8"  # 4 shingles, 3 shared -> 0.75 < 0.8
    b = "w1 w2 w3 w4 w5 w6 w7 zz"
    out = containment_pairs(_docs(spark, [(1, a), (2, b)]), n=5, threshold=0.8)
    assert out.where(F.col("doc_a") == 1).count() == 0


def test_comoment_sums_pinned_scale_merges_exactly(spark):
    # the t19 contract: with a PINNED scale, per-split co-moment cells
    # SUM-merge to exactly the one-shot answer for ANY split
    rows = [(i, [float(i) * 0.3, 2.0 - i, float(i % 3)]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    one = {
        (r["i"], r["j"]): r
        for r in embedred.comoment_sums(df, dim=3, scale=0.5).collect()
    }
    a = embedred.comoment_sums(
        df.where("vec_id < 4"), dim=3, scale=0.5
    ).collect()
    b = embedred.comoment_sums(
        df.where("vec_id >= 4"), dim=3, scale=0.5
    ).collect()
    merged: dict = {}
    for r in list(a) + list(b):
        k = (r["i"], r["j"])
        if k not in merged:
            merged[k] = dict(sxy=0, si=0, sj=0, n=0)
        for c in ("sxy", "si", "sj", "n"):
            merged[k][c] += r[c]
    assert set(merged) == set(one)
    for k, m in merged.items():
        for c in ("sxy", "si", "sj", "n"):
            assert m[c] == one[k][c], (k, c)


def test_comoment_sums_per_batch_scale_does_not_merge(spark):
    # the reason t19 MUST pin the scale: data-derived per-split scales
    # put splits on different grids, so the summed cells diverge from
    # the one-shot answer on data whose amax differs across splits
    rows = [(0, [100.0, 1.0]), (1, [100.0, 2.0]), (2, [10.0, 3.0]), (3, [10.0, 4.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    one = {
        (r["i"], r["j"]): r["sxy"]
        for r in embedred.comoment_sums(df, dim=2).collect()
    }
    a = embedred.comoment_sums(df.where("vec_id < 2"), dim=2).collect()
    b = embedred.comoment_sums(df.where("vec_id >= 2"), dim=2).collect()
    merged: dict = {}
    for r in list(a) + list(b):
        merged[(r["i"], r["j"])] = merged.get((r["i"], r["j"]), 0) + r["sxy"]
    assert merged != one


def test_multiprobe_finds_boundary_neighbor_single_probe_misses(spark):
    # ids 1 and 2 seed two near-orthogonal-ish cells; 3 and 4 are
    # nearly identical to each other but land in DIFFERENT primary
    # cells (3 -> cell of 1, 4 -> cell of 2). Single-probe never pairs
    # them; top-2 assignment finds the pair through the shared second
    # cell.
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.6, 0.8]),
        (3, [0.9272, 0.3746]),   # 22deg: nearer centroid 1 (boundary ~26.5deg)
        (4, [0.8660, 0.5000]),   # 30deg: nearer centroid 2
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    single = embedred.knn_graph(df, k=2, n_centroids=2)
    multi = embedred.knn_graph_multiprobe(df, k=2, n_centroids=2, nprobe=2)
    s_pairs = {(r["vec_id"], r["nbr_id"]) for r in single.collect()}
    m_pairs = {(r["vec_id"], r["nbr_id"]) for r in multi.collect()}
    assert (3, 4) not in s_pairs  # split by the cell boundary
    assert (3, 4) in m_pairs and (4, 3) in m_pairs
    # multi-assignment candidates are a superset of single-probe's
    assert s_pairs <= m_pairs or all(p in m_pairs for p in s_pairs)
