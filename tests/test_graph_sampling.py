"""Connected-components and deterministic-sampling operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.operators.graph import (
    connected_components,
    duplicate_groups_from_pairs,
)
from iheardai_data_pipeline_spark.operators.sampling import (
    assign_shards,
    deterministic_sample,
    stratified_sample,
)


def test_components_chain_merges_transitively(spark):
    # 1-2, 2-3, 3-4 chain + isolated pair 10-11: closure must merge the
    # chain even though 1 and 4 never share an edge
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_components_edge_order_invariant(spark):
    e1 = spark.createDataFrame([(5, 3), (3, 9), (9, 1)], "src long, dst long")
    e2 = spark.createDataFrame([(9, 1), (5, 3), (3, 9)], "src long, dst long")
    c1 = sorted(map(tuple, connected_components(e1).collect()))
    c2 = sorted(map(tuple, connected_components(e2).collect()))
    assert c1 == c2 == [(1, 1), (3, 1), (5, 1), (9, 1)]


def test_components_local_and_distributed_paths_agree(spark):
    # chain + clique + isolated pair; threshold=0 forces the distributed
    # min-label loop, default takes the driver union-find — same answer
    raw = [(1, 2), (2, 3), (3, 4), (7, 8), (8, 9), (7, 9), (20, 21)]
    edges = spark.createDataFrame(raw, "src long, dst long")
    local = sorted(map(tuple, connected_components(edges).collect()))
    dist = sorted(
        map(tuple, connected_components(edges, local_edge_threshold=0).collect())
    )
    assert local == dist
    assert dict(local)[4] == 1 and dict(local)[9] == 7


def test_duplicate_groups_include_singletons(spark):
    docs = spark.createDataFrame([(1,), (2,), (3,), (4,)], "doc_id long")
    pairs = spark.createDataFrame([(1, 3)], "doc_a long, doc_b long")
    got = {
        r["doc_id"]: (r["component"], r["is_keeper"])
        for r in duplicate_groups_from_pairs(docs, pairs).collect()
    }
    assert got == {1: (1, True), 2: (2, True), 3: (1, False), 4: (4, True)}


def test_sample_is_nested_and_stable(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s10 = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 10).collect()}
    s10_again = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 10).collect()}
    s20 = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 20).collect()}
    assert s10 == s10_again  # reproducible
    assert s10 <= s20  # enlarging the rate keeps prior rows
    assert 0.05 < len(s10) / 2000 < 0.15  # near the nominal rate


def test_shards_cover_range_and_are_stable(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    shards = assign_shards(df, "doc_id", 8)
    got = shards.groupBy("shard").count().collect()
    assert {r["shard"] for r in got} == set(range(8))
    first = {r["doc_id"]: r["shard"] for r in shards.collect()}
    second = {r["doc_id"]: r["shard"] for r in assign_shards(df, "doc_id", 8).collect()}
    assert first == second


def test_stratified_sample_rates_and_default(spark):
    df = (
        spark.range(0, 3000)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "grp",
            F.when(F.col("doc_id") % 3 == 0, "a")
            .when(F.col("doc_id") % 3 == 1, "b")
            .otherwise("c"),
        )
    )
    out = stratified_sample(df, "doc_id", "grp", {"a": (10, 100), "b": (100, 100)})
    counts = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts.get("c") is None          # no default rate -> dropped
    assert counts["b"] == 1000              # kept whole
    assert 60 <= counts["a"] <= 140         # ~10% of 1000
    # nested within the flat sample: stratum-a rows are a subset of the
    # same-rate unstratified sample
    flat = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 10).collect()}
    a_rows = {r["doc_id"] for r in out.filter("grp = 'a'").collect()}
    assert a_rows <= flat


def test_pagerank_fixed_known_graph(spark):
    """3-node chain a->b->c (+c->a cycle): hand-computable in micro-units."""
    from iheardai_data_pipeline_spark.operators.graph import pagerank_fixed

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    pr = {r["node"]: r["pr_micro"] for r in pagerank_fixed(edges, iters=3).collect()}
    # symmetric cycle: every node identical, mass ~scale (floor losses only)
    assert len(set(pr.values())) == 1
    total = sum(pr.values())
    assert 990_000 <= total <= 1_000_000  # floor-division loss is bounded


def test_pagerank_fixed_sink_attracts_mass(spark):
    from iheardai_data_pipeline_spark.operators.graph import pagerank_fixed

    # star: 1,2,3 all point at 4 (4 dangles — its mass drops per round)
    edges = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4)], "src long, dst long"
    )
    pr = {r["node"]: r["pr_micro"] for r in pagerank_fixed(edges, iters=3).collect()}
    assert pr[4] > pr[1] == pr[2] == pr[3]  # hub outranks the leaves


def test_pagerank_weighted_favors_heavier_edge(spark):
    from iheardai_data_pipeline_spark.operators.graph import pagerank_fixed

    # 1 sends 9x the weight to node 2 vs node 3
    edges = spark.createDataFrame(
        [(1, 2, 9), (1, 3, 1)], "src long, dst long, w long"
    )
    pr = {
        r["node"]: r["pr_micro"]
        for r in pagerank_fixed(edges, iters=3, weight_col="w").collect()
    }
    assert pr[2] > pr[3]  # weighted inflow, not equal split


def test_pagerank_weighted_drops_nonpositive_weights(spark):
    """A source whose weight sum is 0 must not divide-by-zero (NULL in
    Spark 'div', an error in strict engines): non-positive edges are
    dropped before the degree computation, so node 9's outgoing edge
    vanishes and node 9 itself survives only if referenced elsewhere."""
    from iheardai_data_pipeline_spark.operators.graph import pagerank_fixed

    edges = spark.createDataFrame(
        [(1, 2, 5), (9, 2, 0), (9, 3, -4)], "src long, dst long, w long"
    )
    pr = {
        r["node"]: r["pr_micro"]
        for r in pagerank_fixed(edges, iters=2, weight_col="w").collect()
    }
    # only the positive edge survives: graph is 1->2
    assert set(pr) == {1, 2}
    assert pr[2] > pr[1]
    assert all(v is not None for v in pr.values())


def test_leakage_safe_split_keeps_groups_together(spark, sf_dir):
    """No near-dup pair may straddle splits — the property the split
    exists for, asserted on the real fixture corpus."""
    from iheardai_data_pipeline_spark.plans.catalog import CATALOG, _ensure_loaded
    from iheardai_data_pipeline_spark.operators import dedup

    _ensure_loaded()
    from iheardai_data_pipeline_spark.sources.batch import load_table

    assigned = CATALOG["x_split_leakage_safe"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, n=5, threshold=0.7, max_doc_freq=100)
    from pyspark.sql import functions as F

    a = assigned.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    b = assigned.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    straddlers = pairs.join(a, "doc_a").join(b, "doc_b").filter("sa <> sb")
    assert straddlers.count() == 0
    # all three splits are populated on the fixture corpus
    splits = {r["split"] for r in assigned.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}


def test_components_path_graph_log_rounds(spark):
    """A 1024-node path is the diameter worst case (pathological chained
    substring dupes): plain min-label propagation needs ~1024 rounds;
    the pointer-doubling shortcut must converge inside max_iter=25
    (O(log d)) and still label every node with the chain head."""
    from pyspark.sql import functions as F
    from iheardai_data_pipeline_spark.operators.graph import connected_components

    n = 1024
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    out = connected_components(edges, local_edge_threshold=0, max_iter=25)
    comp = {r["node"]: r["component"] for r in out.collect()}
    assert len(comp) == n and set(comp.values()) == {0}


def test_components_nonconvergence_raises(spark):
    """Hitting max_iter without a fixed point must raise, not return a
    silently split component set."""
    import pytest
    from pyspark.sql import functions as F
    from iheardai_data_pipeline_spark.operators.graph import connected_components

    edges = spark.range(63).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, local_edge_threshold=0, max_iter=2)


def test_triangle_count_known_graph(spark):
    """Hand-checkable graph: one K4 (4 triangles, each node in 3),
    a pendant edge, and a disconnected triangle."""
    from iheardai_data_pipeline_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    extra = [(3, 10), (20, 21), (21, 22), (22, 20)]
    # duplicates + reversed orientation must not change the answer
    edges = spark.createDataFrame(
        k4 + extra + [(b, a) for a, b in k4], "src long, dst long"
    )
    got = {r["node"]: r["n_tri"] for r in triangle_count(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 20: 1, 21: 1, 22: 1}


def test_triangle_count_star_has_none(spark):
    """A star (maximum-skew hub) has zero triangles — and the oriented
    plan never pivots on the hub (its (deg,id) order is highest)."""
    from iheardai_data_pipeline_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 30)], "src long, dst long"
    )
    assert triangle_count(edges).count() == 0


def test_kcore_peels_pendants_and_keeps_cycles(spark):
    """Triangle + pendant chain: the 2-core keeps exactly the triangle
    (a cascade: dropping the leaf makes its parent sub-k next round)."""
    from iheardai_data_pipeline_spark.operators.graph import kcore

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    got = {r["node"]: r["degree"] for r in kcore(edges, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    # k=3: the triangle is only a 2-core — empty result, correct schema
    empty = kcore(edges, k=3)
    assert empty.count() == 0 and set(empty.columns) == {"node", "degree"}


def test_kcore_nonconvergence_raises(spark):
    """A long chain peels one layer per round from each end; with
    max_rounds too small the loop must RAISE, not return a non-core."""
    import pytest

    from iheardai_data_pipeline_spark.operators.graph import kcore

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(chain, k=2, max_rounds=2)
    assert kcore(chain, k=2, max_rounds=12).count() == 0  # chain has no 2-core


def test_kcore_allows_max_rounds_dropping_rounds(spark):
    """max_rounds bounds DROPPING rounds; the no-drop detection round is
    free on top — a graph that peels in exactly max_rounds rounds
    converges instead of raising (so an unrolled oracle with
    rounds == max_rounds no-ops past the same fixpoint)."""
    from iheardai_data_pipeline_spark.operators.graph import kcore

    # triangle + 3-link tail: the tail peels one node per round
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)],
        "src long, dst long",
    )
    got = {r["node"] for r in kcore(edges, k=2, max_rounds=3).collect()}
    assert got == {1, 2, 3}


def test_coreness_known_graph(spark):
    """K4 sharing a vertex with a triangle, plus a pendant: coreness is
    3 on the K4, 2 on the triangle's other nodes, 1 on the pendant."""
    from iheardai_data_pipeline_spark.operators.graph import coreness

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tri = [(4, 5), (5, 6), (4, 6)]
    pend = [(6, 7)]
    edges = spark.createDataFrame(k4 + tri + pend, "src long, dst long")
    got = {r["node"]: r["coreness"] for r in coreness(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 2, 6: 2, 7: 1}


def test_coreness_matches_kcore_membership(spark):
    """coreness(node) >= k  <=>  node in kcore(k) — cross-checked on a
    mixed graph for every k up to the degeneracy."""
    from iheardai_data_pipeline_spark.operators.graph import coreness, kcore

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 3), (5, 6), (9, 10)],
        "src long, dst long",
    )
    cz = {r["node"]: r["coreness"] for r in coreness(edges).collect()}
    for k in (1, 2, 3):
        core_nodes = {r["node"] for r in kcore(edges, k=k).collect()}
        assert core_nodes == {n for n, c in cz.items() if c >= k}, k


def test_coreness_exceeding_max_k_raises(spark):
    import pytest

    from iheardai_data_pipeline_spark.operators.graph import coreness

    k4 = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="max_k"):
        coreness(k4, max_k=2)
