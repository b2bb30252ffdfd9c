"""Property-based invariants (SURVEY.md §5): PII redaction idempotence,
score range bounds, upsert idempotence, sessionization conservation."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.functions.common import redact_pii
from iheardai_data_pipeline_spark.functions.frontend import engagement_score
from iheardai_data_pipeline_spark.functions.text_agent import business_value_score
from iheardai_data_pipeline_spark.operators.mutations import last_write_wins
from iheardai_data_pipeline_spark.operators.sessionize import session_kpis
from iheardai_data_pipeline_spark.operators.text import quality_score
from iheardai_data_pipeline_spark.sources.batch import load_table

_PII_BITS = st.sampled_from(
    [
        "contact me at jane.doe@example.com please",
        "call 555-123-4567 or (555) 987-6543",
        "card 4111 1111 1111 1111 ssn 123-45-6789",
        "no pii here at all",
        "x@y.io and 1-555-000-1111 mixed",
        "",
    ]
)
_NOISE = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00"), max_size=40
)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(_PII_BITS, _NOISE), min_size=1, max_size=24))
def test_pii_redaction_idempotent(spark, rows):
    df = spark.createDataFrame(
        [(f"{n} {p}",) for p, n in rows], "t string"
    ).select(
        redact_pii(F.col("t")).alias("once"),
    ).select(
        "once", redact_pii(F.col("once")).alias("twice")
    )
    bad = df.filter(F.col("once") != F.col("twice")).count()
    assert bad == 0


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["purchase", "click", "scroll", "weird", ""]),
            st.integers(min_value=-10_000, max_value=10_000),
            st.text(max_size=60),
            st.integers(min_value=-500, max_value=5_000),
        ),
        min_size=1,
        max_size=24,
    )
)
def test_scores_always_bounded(spark, rows):
    df = spark.createDataFrame(
        rows, "event_type string, top long, body string, tokens_out long"
    ).select(
        engagement_score(F.col("event_type"), F.col("top")).alias("engagement"),
        business_value_score(F.col("body"), F.col("tokens_out")).alias("bvalue"),
        quality_score(F.col("body")).alias("quality"),
    )
    out_of_range = df.filter(
        (F.col("engagement") < 0) | (F.col("engagement") > 100)
        | (F.col("bvalue") < 0) | (F.col("bvalue") > 100)
        | (F.col("quality") < 0) | (F.col("quality") > 100)
    ).count()
    assert out_of_range == 0


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # key
            st.integers(min_value=0, max_value=50),  # version
            st.integers(min_value=0, max_value=999),  # payload
        ),
        min_size=1,
        max_size=30,
    )
)
def test_last_write_wins_idempotent(spark, rows):
    df = spark.createDataFrame(rows, "k long, v long, payload long")
    once = last_write_wins(df, key_cols=["k"], order_cols=["v", "payload"])
    twice = last_write_wins(once, key_cols=["k"], order_cols=["v", "payload"])
    # applying twice equals once, and applying to doubled input equals once
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    doubled = last_write_wins(df.union(df), key_cols=["k"], order_cols=["v", "payload"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, doubled.collect()))
    # exactly one survivor per distinct key
    assert once.count() == df.select("k").distinct().count()


def test_sessionization_conserves_events(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    kpis = session_kpis(events)
    total = events.count()
    assert kpis.agg(F.sum("n_events")).first()[0] == total


@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(0, 500)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 64),
)
@settings(max_examples=12, deadline=None)
def test_packing_prefix_sum_invariants(spark, rows, bucket_size):
    """Two-level prefix sum: offsets are the exclusive cumsum in key
    order, for any key distribution and bucket size."""
    from iheardai_data_pipeline_spark.operators.packing import (
        with_global_running_total,
    )

    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = (
        with_global_running_total(df, "doc_id", "n", bucket_size=bucket_size)
        .orderBy("doc_id")
        .collect()
    )
    expect = 0
    for row, (_, n) in zip(got, sorted(rows)):
        assert row["start_offset"] == expect
        expect += n


@given(
    st.lists(
        st.tuples(st.integers(0, 10**4), st.sampled_from(["aa bb cc", "dd ee", "ff"])),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=10, deadline=None)
def test_incremental_dedup_invariants(spark, rows):
    """Output fingerprints are unique, disjoint from the corpus index,
    and a second run over the already-ingested result admits nothing."""
    from iheardai_data_pipeline_spark.operators.dedup import incremental_dedup
    from iheardai_data_pipeline_spark.operators.text import fingerprint_md5

    df = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = df.filter(F.col("doc_id") % 2 == 0).select(
        fingerprint_md5(F.col("text")).alias("fingerprint")
    ).distinct()
    incoming = df.filter(F.col("doc_id") % 2 == 1)
    out = incremental_dedup(incoming, corpus).select("doc_id", "fingerprint").collect()
    fps = [r["fingerprint"] for r in out]
    assert len(fps) == len(set(fps))
    corpus_fps = {r["fingerprint"] for r in corpus.collect()}
    assert not (set(fps) & corpus_fps)
    # ingest the accepted docs, re-run: nothing new can enter
    new_corpus = corpus.unionByName(
        spark.createDataFrame([(f,) for f in fps], "fingerprint string")
    ).distinct()
    again = incremental_dedup(incoming, new_corpus).count()
    assert again == 0


_WORDS = st.sampled_from(["alpha", "beta", "gamma", "delta", "x", "yy"])


@given(
    st.lists(
        st.tuples(
            st.integers(0, 10**4),
            st.lists(_WORDS, min_size=1, max_size=12).map(" ".join),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=10, deadline=None)
def test_repetition_metrics_invariants(spark, rows):
    """All fractions bounded in [0,1]; distinct <= total; the dup
    fraction and the distinct count are two views of the same number;
    a doc of one repeated word maxes every metric."""
    from iheardai_data_pipeline_spark.operators.corpus import repetition_metrics

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = repetition_metrics(df).collect()
    assert len(out) == len(rows)
    for r in out:
        assert 0 <= r.dup_word_frac <= 1
        assert 0 < r.top_word_frac <= 1
        assert 0 <= r.top_bigram_frac <= 1
        assert r.n_distinct_words <= r.n_words
        # dup_word_frac is HALF_UP((n - distinct)/n, 6)
        exact = (r.n_words - r.n_distinct_words) / r.n_words
        assert abs(r.dup_word_frac - exact) <= 5e-7


@given(
    st.lists(
        st.tuples(
            st.integers(0, 10**4),
            st.lists(_WORDS, min_size=1, max_size=10).map(" ".join),
            st.sampled_from(["s0", "s1", "s2"]),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=8, deadline=None)
def test_temperature_sample_invariants(spark, rows):
    """Per-source sampled counts never exceed source sizes; sources sum
    to the input count; rerun is identical (no RNG state)."""
    from iheardai_data_pipeline_spark.operators.corpus import temperature_sample

    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = temperature_sample(df).collect()
    assert sum(r.n_docs for r in out) == len(rows)
    for r in out:
        assert 0 <= r.n_sampled <= r.n_docs
    again = temperature_sample(df).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


@given(
    st.lists(
        st.tuples(
            st.integers(0, 10**4),
            st.lists(_WORDS, min_size=1, max_size=10).map(" ".join),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=8, deadline=None)
def test_corpus_lm_rare_frac_bounds(spark, rows):
    """rare_token_frac in [0,1]; n_tokens matches the whitespace count;
    every doc appears exactly once."""
    from iheardai_data_pipeline_spark.operators.corpus import corpus_lm_scores

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = corpus_lm_scores(df).collect()
    assert len(out) == len(rows)
    by_id = {r.doc_id: r for r in out}
    for doc_id, text in rows:
        r = by_id[doc_id]
        assert r.n_tokens == len(text.split())
        assert 0 <= r.rare_token_frac <= 1
        assert r.mean_tok_fpm > 0


_url_strategy = st.builds(
    lambda scheme, www, host, port, path, slash, params, frag: (
        f"{scheme}://{'www.' if www else ''}{host}{port}{path}{slash}"
        + ("?" + "&".join(params) if params else "")
        + ("#" + frag if frag else "")
    ),
    scheme=st.sampled_from(["http", "https", "HTTP"]),
    www=st.booleans(),
    host=st.sampled_from(["Example.com", "shop.site.org", "a.b.io"]),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.sampled_from(["", "/x", "/x/Y", "/deep/path"]),
    slash=st.sampled_from(["", "/", "//", "///"]),
    params=st.lists(
        st.sampled_from(["a=1", "b=2", "utm_source=g", "UTM_SOURCE=G", "gclid=z", "q=w"]),
        max_size=4,
    ),
    frag=st.sampled_from(["", "top", "sec2", "sec?x=1"]),
)


@given(urls=st.lists(_url_strategy, min_size=1, max_size=20))
@settings(max_examples=15, deadline=None)
def test_canonical_url_idempotent(spark, urls):
    """canonical(canonical(u)) == canonical(u): a canonical form must be
    a fixed point, else corpus URL-dedup keys drift across passes."""
    from iheardai_data_pipeline_spark.functions.frontend import canonical_url

    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = df.select(canonical_url("u").alias("c1"))
    twice = once.select(F.col("c1"), canonical_url("c1").alias("c2"))
    for r in twice.collect():
        assert r["c2"] == r["c1"], (r["c1"], r["c2"])


_word_st = st.sampled_from([f"w{i}" for i in range(8)])
_doc_st = st.lists(_word_st, min_size=0, max_size=30).map(" ".join)


@given(texts=st.lists(_doc_st, min_size=1, max_size=8))
@settings(max_examples=10, deadline=None)
def test_span_detect_and_excise_are_consistent(spark, texts):
    """For ANY corpus: detection's covered-word budget equals exactly
    what excision cuts (n_words - n_kept_words), and the reassembled
    text has n_kept_words words — the two operators must agree or one
    of them lies about the excision cost."""
    from iheardai_data_pipeline_spark.operators.dedup import (
        duplicate_spans,
        excise_duplicate_spans,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    k = 4
    det = {r["doc_id"]: r for r in duplicate_spans(docs, span_words=k).collect()}
    exc = {r["doc_id"]: r for r in excise_duplicate_spans(docs, span_words=k).collect()}
    assert set(det) == set(exc)
    for i in det:
        assert det[i]["n_words"] == exc[i]["n_words"]
        assert det[i]["dup_cover_words"] == exc[i]["n_words"] - exc[i]["n_kept_words"]
        kept = exc[i]["kept_text"]
        # empty-text docs normalize to one ''-token (both engines' split
        # convention): kept_text '' then corresponds to n_kept_words==1,
        # so the word-count check only applies to non-empty reassemblies
        if kept:
            assert len(kept.split(" ")) == exc[i]["n_kept_words"]
