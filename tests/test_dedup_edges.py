"""Dedup operator edge cases on tiny inline data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.operators.dedup import (
    exact_duplicate_groups,
    ngram_jaccard_pairs,
    word_shingles,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_short_docs_yield_no_shingles(spark):
    docs = _docs(spark, [(1, "too few words"), (2, "exactly five words right here")])
    sh = word_shingles(docs, n=5)
    got = {(r["doc_id"], r["shingle"]) for r in sh.collect()}
    assert got == {(2, "exactly five words right here")}


def test_exact_dup_groups_normalize_whitespace_case(spark):
    docs = _docs(
        spark,
        [(1, "Hello   World"), (2, "hello world"), (3, "different text")],
    )
    out = {r["doc_id"]: (r["group_size"], r["is_keeper"]) for r in
           exact_duplicate_groups(docs).collect()}
    assert out[1] == (2, True) and out[2] == (2, False) and out[3] == (1, True)


def test_jaccard_identical_docs(spark):
    text = "one two three four five six seven eight nine ten"
    docs = _docs(spark, [(1, text), (2, text), (3, "a b c d e f g h i j")])
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs == {(1, 2): 1.0}


def test_lsh_streaming_verify_equals_array_verify_on_long_docs(spark):
    """The memory-bounded per-shingle verify must return EXACTLY the
    array-intersect verify's pairs and jaccards, including on book-length
    texts (the case the streaming mode exists for)."""
    from iheardai_data_pipeline_spark.operators.dedup import minhash_lsh_pairs

    # synthetic "books": thousands of words, with near-dup structure —
    # base text, light edits (insertions / substitutions), and unrelated
    # controls; deterministic construction, no RNG state
    base = " ".join(f"w{i % 977} t{i % 389} s{(i * 7) % 613}" for i in range(2000))
    edited = base.replace("w5 ", "w5 EXTRA ", 20)  # ~1% insertions
    subbed = " ".join(
        (w if i % 29 else "SUB") for i, w in enumerate(base.split())
    )
    control = " ".join(f"c{i}" for i in range(5000))
    docs = _docs(
        spark,
        [(1, base), (2, edited), (3, subbed), (4, control), (5, base + " tail words here")],
    )
    kwargs = dict(n=5, k=64, bands=16, threshold=0.5)
    want = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, verify="array", **kwargs).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, verify="streaming", **kwargs).collect()
    }
    assert want, "fixture produced no near-dup pairs — test is vacuous"
    assert got == want


def test_line_dedup_drops_corpus_repeated_lines(spark):
    # two docs share an identical 10-word span; each also has a unique span
    boiler = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [
            (1, boiler + " one two three four five six seven eight nine ten"),
            (2, boiler + " u v w x y z aa bb cc dd"),
            (3, "solo line that appears only once in the whole corpus"),
        ],
        "doc_id long, text string",
    )
    from iheardai_data_pipeline_spark.operators.dedup import line_dedup

    out = {r["doc_id"]: r for r in line_dedup(docs, words_per_line=10).collect()}
    assert out[1]["n_lines"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["kept_text"] == "one two three four five six seven eight nine ten"
    assert out[2]["n_kept"] == 1 and not out[2]["kept_text"].startswith("a b")
    assert out[3]["n_kept"] == 1  # unique lines survive untouched


def test_line_dedup_reassembles_in_original_order(spark):
    text = " ".join(f"w{i}" for i in range(25))  # 3 lines: 10+10+5 words
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    from iheardai_data_pipeline_spark.operators.dedup import line_dedup

    row = line_dedup(docs, words_per_line=10).collect()[0]
    assert row["n_lines"] == 3 and row["n_kept"] == 3
    assert row["kept_text"] == text  # order preserved through reassembly


def test_duplicate_spans_flags_shared_run(spark):
    """Two docs share a 12-word run at DIFFERENT offsets; with k=10 the
    shared run contributes 3 aligned spans covering all 12 words."""
    from iheardai_data_pipeline_spark.operators.dedup import duplicate_spans

    shared = " ".join(f"s{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            (1, shared + " tail1 tail2 tail3"),            # run at offset 0
            (2, "head1 head2 " + shared),                  # run at offset 2
            (3, "totally different words " + " ".join(f"u{i}" for i in range(10))),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in duplicate_spans(docs, span_words=10).collect()}
    # 12-word run, k=10 -> 3 duplicated start positions, 12 covered words
    assert out[1]["n_dup_spans"] == 3 and out[1]["dup_cover_words"] == 12
    assert out[2]["n_dup_spans"] == 3 and out[2]["dup_cover_words"] == 12
    assert out[3]["n_dup_spans"] == 0 and out[3]["dup_cover_words"] == 0
    # n_spans = n_words - k + 1
    assert out[1]["n_words"] == 15 and out[1]["n_spans"] == 6


def test_duplicate_spans_short_doc_and_intra_doc_repeat(spark):
    from iheardai_data_pipeline_spark.operators.dedup import duplicate_spans

    rep = " ".join(f"r{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, "too short"),            # < k words: zero spans
            (2, rep + " " + rep),        # span repeated only WITHIN one doc
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in duplicate_spans(docs, span_words=10).collect()}
    assert out[1]["n_spans"] == 0 and out[1]["n_dup_spans"] == 0
    # intra-doc repetition is NOT cross-doc duplication (min_docs counts
    # DISTINCT docs) — the Gopher repetition filter owns this case
    assert out[2]["n_dup_spans"] == 0


def test_excise_duplicate_spans_cuts_shared_run_keeps_rest(spark):
    from iheardai_data_pipeline_spark.operators.dedup import excise_duplicate_spans

    shared = " ".join(f"s{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            (1, shared + " tail1 tail2 tail3"),
            (2, "head1 head2 " + shared),
            (3, "unique words only " + " ".join(f"u{i}" for i in range(10))),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in excise_duplicate_spans(docs, span_words=10).collect()
    }
    # the 12 shared words are cut; the unique tails/heads survive in order
    assert out[1]["kept_text"] == "tail1 tail2 tail3"
    assert out[1]["n_words"] == 15 and out[1]["n_kept_words"] == 3
    assert out[2]["kept_text"] == "head1 head2"
    # untouched doc reassembles to its (normalized) self
    assert out[3]["n_kept_words"] == out[3]["n_words"]
    assert out[3]["kept_text"].startswith("unique words only")


def test_incremental_minhash_rejects_near_dups(spark):
    from iheardai_data_pipeline_spark.operators.dedup import incremental_minhash_dedup

    base = " ".join(f"w{i}" for i in range(30))
    corpus = spark.createDataFrame([(100, base)], "doc_id long, text string")
    incoming = spark.createDataFrame(
        [
            (1, base + " extra"),                       # near-dup of corpus -> dropped
            (2, " ".join(f"u{i}" for i in range(30))),  # unique -> kept
            (3, " ".join(f"u{i}" for i in range(30)) + " tail"),  # near-dup of 2 (lower id) -> dropped
            (4, "short"),                               # < 5 words: no shingles, kept
        ],
        "doc_id long, text string",
    )
    kept = {
        r["doc_id"]
        for r in incremental_minhash_dedup(incoming, corpus, threshold=0.7).collect()
    }
    assert kept == {2, 4}


def test_incremental_minhash_negative_hash_ids(spark):
    """Hash-derived doc ids are signed longs — odd NEGATIVE incoming ids
    must still be recognized as incoming (sign-safe parity) and near-dups
    must drop; and ids at/beyond 2^62 must fail loudly, not wrap."""
    import pytest
    from iheardai_data_pipeline_spark.operators.dedup import incremental_minhash_dedup

    base = " ".join(f"w{i}" for i in range(30))
    uniq = " ".join(f"u{i}" for i in range(30))
    corpus = spark.createDataFrame([(-1000, base)], "doc_id long, text string")
    incoming = spark.createDataFrame(
        [
            (-7, base + " extra"),   # near-dup of corpus -> dropped
            (-3, uniq),              # unique, lower id -> kept
            (-1, uniq + " tail"),    # near-dup of -3 (lower id) -> dropped
            (5, uniq + " tail2"),    # near-dup of -3 across sign -> dropped
        ],
        "doc_id long, text string",
    )
    kept = {
        r["doc_id"]
        for r in incremental_minhash_dedup(incoming, corpus, threshold=0.7).collect()
    }
    assert kept == {-3}

    big = spark.createDataFrame([(1 << 62, base)], "doc_id long, text string")
    with pytest.raises(Exception, match="2\\^62"):
        incremental_minhash_dedup(big, corpus, threshold=0.7).collect()


def test_incremental_minhash_capped_candidates(spark):
    """Dense duplicate families: the capped gate (top-N candidates per
    drop target by band-collision count) must reproduce the exact
    survivor set when every true match collides in many bands."""
    from iheardai_data_pipeline_spark.operators.dedup import incremental_minhash_dedup

    def fam(tag, i):
        return " ".join(f"{tag}{j}" for j in range(30)) + f" tail{i}"

    corpus = spark.createDataFrame(
        [(100 + i, fam("a", 0)) for i in range(3)], "doc_id long, text string"
    )
    rows = [(i, fam("a", i)) for i in range(1, 8)]          # family a: all drop
    rows += [(10 + i, fam("b", i)) for i in range(6)]       # family b: first kept
    rows += [(20, " ".join(f"z{j}" for j in range(30)))]    # unique: kept
    incoming = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        r["doc_id"]
        for r in incremental_minhash_dedup(incoming, corpus, threshold=0.7).collect()
    }
    capped = {
        r["doc_id"]
        for r in incremental_minhash_dedup(
            incoming, corpus, threshold=0.7, max_candidates_per_doc=2
        ).collect()
    }
    assert exact == capped == {10, 20}


class TestPrefixFilter:
    """PPJoin prefix filtering: completeness by theorem — including the
    hot-shingle-only pairs the df-capped candidate generator drops, and
    the exact-integer ceil at threshold boundaries."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_equals_bruteforce_on_synthetic_corpus(self, spark):
        from itertools import combinations

        from iheardai_data_pipeline_spark.operators import dedup

        base = [f"w{i}" for i in range(24)]
        rows = [
            (1, " ".join(base)),
            (2, " ".join(base[:20] + ["x1", "x2", "x3", "x4"])),  # high overlap
            (3, " ".join(base[:10] + [f"y{i}" for i in range(14)])),
            (4, " ".join(f"z{i}" for i in range(24))),             # disjoint
            (5, " ".join(base)),                                   # exact dup of 1
        ]
        docs = self._docs(spark, rows)
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in dedup.prefix_filter_pairs(docs, threshold=0.5).collect()
        }

        # brute force with identical shingle/jaccard arithmetic
        def sh(text):
            ws = text.split()
            return {" ".join(ws[i:i + 5]) for i in range(len(ws) - 4)}

        want = {}
        by_id = {i: sh(t) for i, t in rows}
        for a, b in combinations(sorted(by_id), 2):
            inter = len(by_id[a] & by_id[b])
            union = len(by_id[a] | by_id[b])
            if union and inter / union >= 0.5:
                want[(a, b)] = inter / union
        assert set(got) == set(want)

    def test_finds_hot_shingle_only_pairs_the_df_cap_drops(self, spark):
        """Two near-identical docs whose EVERY shared shingle is hot
        (shared by many replicas): the df-capped generator has no
        sub-cap shingle to block on and silently misses the pair;
        prefix filtering finds it through the globally-ordered prefix
        regardless of frequency."""
        from iheardai_data_pipeline_spark.operators import dedup

        text = " ".join(f"h{i}" for i in range(30))
        docs = self._docs(
            spark, [(i, text) for i in range(10)]  # 10 exact replicas
        )
        pf = dedup.prefix_filter_pairs(docs, threshold=0.7)
        assert pf.count() == 45  # all C(10,2) duplicate pairs
        capped = dedup.ngram_jaccard_pairs(docs, threshold=0.7, max_doc_freq=5)
        assert capped.count() == 0  # the documented df-cap blind spot

    def test_threshold_boundary_uses_exact_integer_ceil(self, spark):
        """jaccard EXACTLY at the threshold must be kept: with |A| =
        |B| = 20 shingles and 14 shared (t = 0.7 -> overlap bound
        ceil(0.7*20) = 14), a float ceil(14.000000000000002) = 15
        would shrink the prefix and can drop the pair."""
        from iheardai_data_pipeline_spark.operators import dedup

        # 24-word docs -> 20 shingles each; first 18 words shared ->
        # 14 shared shingles; union 26 -> jaccard = 14/26 ~ 0.5385
        a = [f"s{i}" for i in range(18)]
        docs = self._docs(
            spark,
            [
                (1, " ".join(a + ["a1", "a2", "a3", "a4", "a5", "a6"])),
                (2, " ".join(a + ["b1", "b2", "b3", "b4", "b5", "b6"])),
            ],
        )
        got = dedup.prefix_filter_pairs(docs, threshold=14 / 26).collect()
        assert [(r["doc_a"], r["doc_b"]) for r in got] == [(1, 2)]


# --- Bloom-prefiltered incremental dedup (round 7) ----------------------------------


class TestBloomPrefilter:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    @pytest.mark.parametrize("m,k", [(64, 3), (4096, 6)])
    def test_survivors_identical_with_and_without_bloom(self, spark, m, k):
        """The Bloom path must be a pure optimization: tiny m (heavy
        false positives -> most rows still take the anti-join) and
        roomy m (most new rows bypass it) both reproduce the plain
        survivor set exactly."""
        from iheardai_data_pipeline_spark.operators import dedup
        from iheardai_data_pipeline_spark.operators.sketch import bloom_build
        from iheardai_data_pipeline_spark.operators.text import fingerprint_md5

        corpus_docs = self._docs(
            spark, [(i, f"doc number {i % 20}") for i in range(40)]
        )
        corpus = corpus_docs.select(
            fingerprint_md5(F.col("text")).alias("fingerprint")
        ).distinct()
        incoming = self._docs(
            spark,
            # overlaps corpus (i%20 collides), intra-batch dupes, and new
            [(100 + i, f"doc number {i % 30}") for i in range(60)]
            + [(200, "fresh one"), (201, "fresh one"), (202, "fresh two")]
            # NULL text -> NULL fingerprint: every bloom bit-check is
            # NULL; the flag must coalesce to FALSE (definitely new,
            # since NULL never equals a corpus fp under join equality)
            # or these rows vanish from the bloom path only.
            + [(300, None), (301, None)],
        )
        plain = sorted(
            tuple(r)
            for r in dedup.incremental_dedup(incoming, corpus)
            .select("doc_id", "fingerprint")
            .collect()
        )
        bloom = bloom_build(corpus, "fingerprint", m=m, k=k)
        bloomed = sorted(
            tuple(r)
            for r in dedup.incremental_dedup(
                incoming, corpus, bloom=bloom, bloom_m=m, bloom_k=k
            )
            .select("doc_id", "fingerprint")
            .collect()
        )
        assert bloomed == plain

    def test_no_false_negatives_on_members(self, spark):
        """Every indexed fingerprint must probe TRUE — the contract
        that makes the anti-join bypass safe."""
        from iheardai_data_pipeline_spark.operators.dedup import (
            bloom_prefilter_flags,
        )
        from iheardai_data_pipeline_spark.operators.sketch import bloom_build

        keys = spark.createDataFrame(
            [(f"key-{i}",) for i in range(200)], "fingerprint string"
        )
        bloom = bloom_build(keys, "fingerprint", m=512, k=4)
        flags = bloom_prefilter_flags(keys, bloom, "fingerprint", m=512, k=4)
        assert flags.filter(~F.col("__maybe_present")).count() == 0

    def test_empty_corpus_bloom_rejects_everything(self, spark):
        """An empty filter flags every row FALSE (definitely new): the
        whole batch bypasses the anti-join and only the intra-batch
        keeper window applies."""
        from iheardai_data_pipeline_spark.operators import dedup
        from iheardai_data_pipeline_spark.operators.sketch import bloom_build

        empty = spark.createDataFrame([], "fingerprint string")
        bloom = bloom_build(empty, "fingerprint", m=256, k=4)
        incoming = self._docs(
            spark, [(1, "aa"), (2, "aa"), (3, "bb")]
        )
        kept = dedup.incremental_dedup(
            incoming, empty, bloom=bloom, bloom_m=256, bloom_k=4
        )
        assert {r["doc_id"] for r in kept.collect()} == {1, 3}
