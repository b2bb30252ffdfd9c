"""Unit tests for operators/corpus.py on crafted documents.

The catalog-oracle test (`test_catalog_oracle.py`) already hash-compares
the four corpus queries against DuckDB on the fixture tables; these
tests pin the SEMANTICS on hand-built edge cases (single-word docs,
fully-repeated docs, deterministic sampling invariants).
"""

from __future__ import annotations

import pytest

from iheardai_data_pipeline_spark.operators import corpus


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


class TestRepetitionMetrics:
    def test_all_distinct_words(self, spark):
        df = _docs(spark, [(1, "a b c d", "s")])
        row = corpus.repetition_metrics(df).collect()[0]
        assert row.n_words == 4
        assert row.n_distinct_words == 4
        assert row.dup_word_frac == 0.0
        assert row.top_word_frac == 0.25
        assert row.top_bigram_frac == pytest.approx(1 / 3, abs=1e-6)

    def test_fully_repeated_doc_dropped(self, spark):
        df = _docs(spark, [(1, "x x x x x x x x x x", "s")])
        row = corpus.repetition_metrics(df).collect()[0]
        assert row.dup_word_frac == 0.9
        assert row.top_word_frac == 1.0
        assert row.top_bigram_frac == 1.0
        assert not row.keep

    def test_single_word_doc_has_zero_bigram_frac(self, spark):
        df = _docs(spark, [(1, "solo", "s")])
        row = corpus.repetition_metrics(df).collect()[0]
        assert row.n_words == 1
        assert row.top_bigram_frac == 0.0

    def test_top_bigram_counts_adjacent_pairs(self, spark):
        # "a b" occurs twice among 4 bigrams
        df = _docs(spark, [(1, "a b a b c", "s")])
        row = corpus.repetition_metrics(df).collect()[0]
        assert row.top_bigram_frac == 0.5


class TestCorpusLmScores:
    def test_common_vs_rare_tokens(self, spark):
        # 'the' appears 8x corpus-wide, 'zq' once; doc 2 is rare-heavy
        df = _docs(
            spark,
            [
                (1, "the the the the the the the the", "s"),
                (2, "zq the", "s"),
            ],
        )
        rows = {r.doc_id: r for r in corpus.corpus_lm_scores(df).collect()}
        # doc1: mean freq = 9/10 corpus tokens -> 900000 fpm
        assert rows[1].mean_tok_fpm == 900000.0
        # doc2: (1*1 + 1*9)/(2*10) = 0.5 -> 500000 fpm
        assert rows[2].mean_tok_fpm == 500000.0
        assert rows[1].rare_token_frac == 0.0
        assert rows[2].rare_token_frac == 0.5  # 'zq' (count 1 < 5)

    def test_n_tokens_matches_whitespace_count(self, spark):
        df = _docs(spark, [(1, "  a  b\tc ", "s")])
        row = corpus.corpus_lm_scores(df).collect()[0]
        assert row.n_tokens == 3


class TestTemperatureSample:
    def test_summary_shape_and_bounds(self, spark, sf_dir):
        from iheardai_data_pipeline_spark.sources.batch import load_table

        docs = load_table(spark, sf_dir, "documents")
        out = corpus.temperature_sample(docs).collect()
        n_sources = docs.select("source").distinct().count()
        assert len(out) == n_sources
        for r in out:
            assert 0 <= r.n_sampled <= r.n_docs

    def test_deterministic_across_runs(self, spark):
        df = _docs(
            spark, [(i, f"w{i} text body", f"src{i % 3}") for i in range(60)]
        )
        a = sorted(map(tuple, corpus.temperature_sample(df).collect()))
        b = sorted(map(tuple, corpus.temperature_sample(df).collect()))
        assert a == b

    def test_equal_sources_get_equal_rates(self, spark):
        # two sources with identical sizes -> identical p_s -> sampled
        # counts depend only on the hash population, but rates match:
        df = _docs(spark, [(i, f"w{i}", f"s{i % 2}") for i in range(100)])
        out = {r.source: r for r in corpus.temperature_sample(df).collect()}
        assert out["s0"].n_docs == out["s1"].n_docs == 50


class TestDupShingleStats:
    def test_disjoint_docs_share_nothing(self, spark):
        df = _docs(
            spark,
            [
                (1, "a b c d e f g", "s"),
                (2, "q r s t u v w", "s"),
            ],
        )
        for r in corpus.dup_shingle_stats(df).collect():
            assert r.n_shared == 0
            assert r.dup_shingle_frac == 0.0

    def test_copied_doc_fully_shared(self, spark):
        text = "one two three four five six seven eight"
        df = _docs(spark, [(1, text, "s"), (2, text, "s")])
        for r in corpus.dup_shingle_stats(df).collect():
            assert r.n_shingles == 4  # 8 words -> 4 distinct 5-grams
            assert r.n_shared == 4
            assert r.dup_shingle_frac == 1.0

    def test_partial_overlap(self, spark):
        # doc2 embeds doc1's text plus unique tail: doc1 fully shared,
        # doc2 partially
        df = _docs(
            spark,
            [
                (1, "one two three four five", "s"),
                (2, "one two three four five zz yy xx ww vv", "s"),
            ],
        )
        rows = {r.doc_id: r for r in corpus.dup_shingle_stats(df).collect()}
        assert rows[1].dup_shingle_frac == 1.0
        assert 0.0 < rows[2].dup_shingle_frac < 1.0


def test_chunk_documents_stride_overlap(spark):
    from iheardai_data_pipeline_spark.operators.text import chunk_documents

    text = " ".join(f"t{i}" for i in range(76))  # 76 tokens -> 3 chunks
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(docs, chunk_tokens=50, stride=25).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2]
    assert [r["n_tokens"] for r in rows] == [50, 50, 26]
    # stride-25 overlap: chunk 1 starts at token 25
    assert rows[1]["chunk_text"].split(" ")[0] == "t25"
    assert rows[2]["chunk_text"].split(" ")[-1] == "t75"


def test_chunk_documents_short_doc_single_chunk(spark):
    from iheardai_data_pipeline_spark.operators.text import chunk_documents

    docs = spark.createDataFrame([(1, "only four tokens here")], "doc_id long, text string")
    rows = chunk_documents(docs, chunk_tokens=50, stride=25).collect()
    assert len(rows) == 1 and rows[0]["n_tokens"] == 4


class TestTopNgrams:
    def test_df_counts_and_rank(self, spark):
        from iheardai_data_pipeline_spark.operators.corpus import top_ngrams

        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox"),
                (2, "the quick brown bear"),
                (3, "a lazy dog sleeps"),
            ],
            "doc_id long, text string",
        )
        out = top_ngrams(docs, n=3, k=3).collect()
        assert [r["ngram"] for r in out][:1] == ["the quick brown"]
        assert out[0]["df"] == 2 and out[0]["rank"] == 1
        # ties (df=1) break on the ngram string ascending
        assert [r["ngram"] for r in out[1:]] == sorted(r["ngram"] for r in out[1:])


class TestHashedQuality:
    def test_exact_milli_sum_and_threshold(self, spark):
        from iheardai_data_pipeline_spark.operators.text import hashed_quality_scores

        docs = spark.createDataFrame(
            [(1, "alpha beta"), (2, "alpha alpha alpha")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in hashed_quality_scores(docs).collect()}
        import hashlib

        def wm(word):
            return int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % 2001 - 1000

        assert out[1]["score_milli_sum"] == wm("alpha") + wm("beta")
        assert out[2]["score_milli_sum"] == 3 * wm("alpha")
        assert out[2]["n_tokens"] == 3
        assert out[2]["keep"] == (out[2]["score"] >= 0.0)


class TestCountMinSketch:
    def test_estimates_never_undercount_and_exact_when_wide(self, spark):
        from iheardai_data_pipeline_spark.operators.sketch import cms_build, cms_estimate

        df = spark.createDataFrame(
            [(k,) for k in ["a"] * 5 + ["b"] * 3 + ["c"] * 1], "k string"
        )
        # tight width: collisions possible, but est >= exact always
        sk = cms_build(df, "k", depth=4, width=2)
        est = {r["k"]: r["est"] for r in cms_estimate(sk, df, "k", 4, 2).collect()}
        assert est["a"] >= 5 and est["b"] >= 3 and est["c"] >= 1
        # wide sketch: no collisions across 3 keys -> exact
        sk = cms_build(df, "k", depth=4, width=4096)
        est = {r["k"]: r["est"] for r in cms_estimate(sk, df, "k", 4, 4096).collect()}
        assert est == {"a": 5, "b": 3, "c": 1}

    def test_unseen_key_estimates_depend_only_on_collisions(self, spark):
        from iheardai_data_pipeline_spark.operators.sketch import cms_build, cms_estimate

        df = spark.createDataFrame([("a",), ("a",)], "k string")
        sk = cms_build(df, "k", depth=4, width=4096)
        probe = spark.createDataFrame([("zzz",)], "k string")
        est = cms_estimate(sk, probe, "k", 4, 4096).collect()[0]["est"]
        assert est == 0  # wide sketch: unseen key hits empty cells

    def test_sketch_state_is_bounded(self, spark):
        from pyspark.sql import functions as F

        from iheardai_data_pipeline_spark.operators.sketch import cms_build

        df = spark.range(5000).select((F.col("id") % 97).alias("k"))
        sk = cms_build(df, "k", depth=4, width=32)
        assert sk.count() <= 4 * 32  # d*w cap regardless of input rows


class TestBloomFilter:
    def test_no_false_negatives_and_bounded_state(self, spark):
        from iheardai_data_pipeline_spark.operators.sketch import (
            bloom_build,
            bloom_probe,
        )
        from pyspark.sql import functions as F

        members = spark.range(200).select((F.col("id") * 3).alias("k"))
        filt = bloom_build(members, "k", m=2048, k=5)
        assert filt.count() <= 2048
        probes = spark.range(900).select(F.col("id").alias("k"))
        got = {r["k"]: r["maybe_present"] for r in bloom_probe(
            filt, probes, "k", m=2048, k=5
        ).collect()}
        # every member probes TRUE — Bloom's contract
        assert all(got[i * 3] for i in range(200))
        # non-members mostly FALSE at this fill rate (fp ~ (1-e^-.5)^5)
        non = [v for kk, v in got.items() if kk % 3 != 0 or kk >= 600]
        assert sum(non) < len(non) * 0.2

    def test_merge_is_union_distinct(self, spark):
        from iheardai_data_pipeline_spark.operators.sketch import bloom_build
        from pyspark.sql import functions as F

        a = spark.range(50).select(F.col("id").alias("k"))
        b = spark.range(50, 100).select(F.col("id").alias("k"))
        both = bloom_build(a.unionByName(b), "k", m=1024, k=4)
        merged = (
            bloom_build(a, "k", m=1024, k=4)
            .unionByName(bloom_build(b, "k", m=1024, k=4))
            .distinct()
        )
        assert sorted(r["bit"] for r in both.collect()) == sorted(
            r["bit"] for r in merged.collect()
        )

    def test_pack_words_roundtrip(self, spark):
        from iheardai_data_pipeline_spark.operators.sketch import (
            bloom_build,
            bloom_pack_words,
        )
        from pyspark.sql import functions as F

        filt = bloom_build(
            spark.range(300).select(F.col("id").alias("k")), "k", m=256, k=4
        )
        bits = {r["bit"] for r in filt.collect()}
        words = {r["word_idx"]: r["word"] for r in bloom_pack_words(filt, 256).collect()}
        unpacked = {
            w * 64 + b
            for w, word in words.items()
            for b in range(64)
            if (word >> b) & 1
        }
        assert unpacked == bits
        # dense fill guarantees bit 63 of some word is exercised
        assert any(b % 64 == 63 for b in bits)


class TestHyperLogLog:
    def test_registers_match_python_and_merge_by_max(self, spark):
        import hashlib
        from iheardai_data_pipeline_spark.operators.sketch import hll_registers
        from pyspark.sql import functions as F

        df = spark.range(500).select(F.col("id").alias("k"))
        got = {
            r["bucket"]: r["max_rank"]
            for r in hll_registers(df, "k", p=6).collect()
        }
        want: dict[int, int] = {}
        for i in range(500):
            h = hashlib.md5(str(i).encode()).hexdigest()
            b = int(h[:8], 16) % 64
            v = int(h[8:16], 16)
            rank = 33 - v.bit_length() if v > 0 else 33
            want[b] = max(want.get(b, 0), rank)
        assert got == want
        # merge = max-combine of two halves
        a = hll_registers(spark.range(250).select(F.col("id").alias("k")), "k", p=6)
        b = hll_registers(
            spark.range(250, 500).select(F.col("id").alias("k")), "k", p=6
        )
        merged = {
            r["bucket"]: r["max_rank"]
            for r in a.unionByName(b)
            .groupBy("bucket")
            .agg(F.max("max_rank").alias("max_rank"))
            .collect()
        }
        assert merged == got

    def test_estimate_within_2x(self, spark):
        from iheardai_data_pipeline_spark.operators.sketch import (
            hll_estimate,
            hll_registers,
        )
        from pyspark.sql import functions as F

        for n in (300, 3000):
            df = spark.range(n).select((F.col("id") * 7 + 1).alias("k"))
            est = (
                hll_registers(df, "k", p=6)
                .agg(hll_estimate(p=6).alias("e"))
                .collect()[0]["e"]
            )
            assert 0.5 * n <= est <= 2.0 * n


class TestQuantileSketch:
    """DDQ sketch: exact bucket arithmetic, mergeability, and the
    relative-error contract of the lower-bound read-off."""

    def _df(self, spark, vals):
        return spark.createDataFrame([(float(v),) for v in vals], "value double")

    def test_bucket_bounds_and_zero_bucket(self, spark):
        from iheardai_data_pipeline_spark.operators.sketch import (
            ddq_build,
            ddq_lower_bound_cents,
        )
        from pyspark.sql import functions as F

        vals = [0.0, 0.01, 0.02, 0.03, 0.5, 1.0, 163.84, 500.0]
        sk = ddq_build(self._df(spark, vals), "value")
        rows = sk.select("e", "m", "cnt", ddq_lower_bound_cents().alias("lb")).collect()
        assert sum(r["cnt"] for r in rows) == len(vals)
        # zero bucket present; every cents value >= its bucket's lower
        # bound and < the next bucket's (checked via the 1.25x step)
        by_bucket = {(r["e"], r["m"]): r["lb"] for r in rows}
        assert by_bucket.get((-1, 0)) == 0
        for v in vals:
            c = round(v * 100)
            if c <= 0:
                continue
            e = c.bit_length() - 1
            m = (c >> max(e - 2, 0)) - (1 << min(e, 2))
            lb = by_bucket[(e, m)]
            assert lb <= c, (v, lb)
            # upper bound of a (e>=2) bucket is lb + 2^(e-2)
            width = max(1, 1 << max(e - 2, 0))
            assert c < lb + width, (v, lb, width)

    def test_merge_equals_one_shot(self, spark):
        from pyspark.sql import functions as F

        from iheardai_data_pipeline_spark.operators.sketch import ddq_build

        a = [1.0, 2.5, 99.99, 0.0, 7.77] * 3
        b = [0.5, 2.5, 640.01, 12.34]
        one = ddq_build(self._df(spark, a + b), "value")
        merged = (
            ddq_build(self._df(spark, a), "value")
            .unionByName(ddq_build(self._df(spark, b), "value"))
            .groupBy("e", "m")
            .agg(F.sum("cnt").alias("cnt"))
        )
        assert sorted(map(tuple, one.collect())) == sorted(
            map(tuple, merged.collect())
        )

    def test_quantile_relative_error_contract(self, spark):
        import random

        from iheardai_data_pipeline_spark.operators.sketch import (
            ddq_build,
            ddq_quantiles,
        )

        rng = random.Random(7)
        vals = [round(rng.uniform(0.01, 500.0), 2) for _ in range(2000)]
        got = {
            r["q"]: r["est"]
            for r in ddq_quantiles(
                ddq_build(self._df(spark, vals), "value"), qs=(0.5, 0.9, 0.99)
            ).collect()
        }
        s = sorted(vals)
        import math

        for q in (0.5, 0.9, 0.99):
            true = s[math.ceil(q * len(s)) - 1]
            # lower-bound read-off: est <= true, within one bucket width
            # (gamma = 1.25 -> est >= true / 1.25)
            assert got[q] <= true + 1e-9, (q, got[q], true)
            assert got[q] >= true / 1.25 - 0.02, (q, got[q], true)


    def test_scale_drives_the_bucket_grid(self, spark):
        """scale=1000 buckets on the milli grid: 0.123 and 0.1 land in
        DIFFERENT buckets (123 vs 100 milli-units) where the cents grid
        would merge them (12 cents vs 10 — same octave+mantissa cell is
        not guaranteed, so use values that the cents grid provably
        merges: 0.001 and 0.002 both round to 0 cents)."""
        from iheardai_data_pipeline_spark.operators.sketch import (
            ddq_build,
            ddq_quantiles,
        )

        df = self._df(spark, [0.001, 0.002])
        cents = ddq_build(df, "value", scale=100).collect()
        assert {(r["e"], r["m"]) for r in cents} == {(-1, 0)}  # both -> 0 cents
        milli = ddq_build(df, "value", scale=1000).collect()
        assert {(r["e"], r["m"]) for r in milli} == {(0, 0), (1, 0)}  # 1, 2
        # read-off divides back on the same grid
        est = {
            r["q"]: r["est"]
            for r in ddq_quantiles(
                ddq_build(df, "value", scale=1000), qs=(0.5,), scale=1000
            ).collect()
        }
        assert est[0.5] == 0.001

    def test_non_power_of_ten_scale_rejected(self, spark):
        import pytest

        from iheardai_data_pipeline_spark.operators.sketch import ddq_build

        with pytest.raises(ValueError, match="power of ten"):
            ddq_build(self._df(spark, [1.0]), "value", scale=60)
