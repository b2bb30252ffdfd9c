"""Property-based invariants for the round-5 operators: BPE length
conservation, HLL merge homomorphism, Bloom completeness, Morton-key
per-dimension monotonicity, and pointer-doubling components equality."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_WORDS = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=6), min_size=1, max_size=12
)


@settings(max_examples=6, deadline=None)
@given(_WORDS, st.integers(min_value=0, max_value=6))
def test_bpe_conserves_characters_and_shrinks_counts(spark, words, n_merges):
    """Merges must never create or destroy text: summed token chars
    minus the end-of-word markers equal the normalized text's non-space
    chars, and the token count never increases as more merges apply."""
    from iheardai_data_pipeline_spark.operators.bpe import EOW, bpe_apply, bpe_train

    text = " ".join(words)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = bpe_train(docs, n_merges=n_merges)
    prev = None
    for upto in range(len(merges) + 1):
        row = bpe_apply(docs, merges[:upto]).collect()[0]
        toks = row["bpe_tokens"]
        # EOW only ever appears as a token suffix (it is each word's
        # last token and SEP blocks cross-word merges) — strip it and
        # the remaining chars must equal the normalized text's
        n_chars = sum(
            len(t) - (len(EOW) if t.endswith(EOW) else 0) for t in toks
        )
        assert n_chars == len("".join(words))
        if prev is not None:
            assert row["n_bpe_tokens"] <= prev
        prev = row["n_bpe_tokens"]


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=40),
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=40),
)
def test_hll_merge_homomorphism(spark, a_keys, b_keys):
    """registers(A ∪ B) == max-merge(registers(A), registers(B)) for any
    key sets — the property that makes micro-batch maintenance exact."""
    from iheardai_data_pipeline_spark.operators.sketch import hll_registers

    a = spark.createDataFrame([(k,) for k in a_keys], "k long")
    b = spark.createDataFrame([(k,) for k in b_keys], "k long")
    whole = {
        r["bucket"]: r["max_rank"]
        for r in hll_registers(a.unionByName(b), "k", p=4).collect()
    }
    merged = {
        r["bucket"]: r["max_rank"]
        for r in hll_registers(a, "k", p=4)
        .unionByName(hll_registers(b, "k", p=4))
        .groupBy("bucket")
        .agg(F.max("max_rank").alias("max_rank"))
        .collect()
    }
    assert whole == merged


@settings(max_examples=6, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60))
def test_bloom_never_misses_a_member(spark, keys):
    from iheardai_data_pipeline_spark.operators.sketch import bloom_build, bloom_probe

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    filt = bloom_build(df, "k", m=512, k=4)
    got = {
        r["k"]: r["maybe_present"]
        for r in bloom_probe(filt, df, "k", m=512, k=4).collect()
    }
    assert all(got[k] for k in keys)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=2,
        max_size=30,
    ),
    st.integers(min_value=0, max_value=255),
)
def test_morton_key_monotone_per_dimension(spark, pairs, fixed_b):
    """With the other coordinate held fixed, the Morton key orders
    exactly like the varying coordinate — the property that makes
    z-ordered min/max footer stats tight in EVERY dimension."""
    from iheardai_data_pipeline_spark.operators.layout import interleave_bits

    a_vals = sorted({a for a, _ in pairs})
    df = spark.createDataFrame([(a, fixed_b) for a in a_vals], "a long, b long")
    keys = [
        r["z"]
        for r in df.select(
            F.col("a"), interleave_bits([F.col("a"), F.col("b")], bits=8).alias("z")
        )
        .orderBy("a")
        .collect()
    ]
    assert keys == sorted(keys)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_components_distributed_equals_local(spark, edges):
    """Pointer-doubling propagation and the driver union-find must label
    every random graph identically."""
    from iheardai_data_pipeline_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, "src long, dst long")
    local = sorted(
        map(tuple, connected_components(df).collect())
    )
    dist = sorted(
        map(tuple, connected_components(df, local_edge_threshold=0).collect())
    )
    assert local == dist
