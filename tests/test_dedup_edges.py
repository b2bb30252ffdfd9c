"""Dedup operator edge cases on tiny inline data."""

from __future__ import annotations

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
