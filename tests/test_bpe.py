"""BPE train/apply: textbook merge behavior, determinism, edge cases,
and the run-overlap semantics the replace() representation guarantees."""

from __future__ import annotations

from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.operators.bpe import (
    EOW,
    bpe_apply,
    bpe_train,
)


def _docs(spark, *texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_train_learns_textbook_merges(spark):
    docs = _docs(spark, "low lower lowest low low newer new")
    merges = bpe_train(docs, n_merges=3)
    # 'lo' is the most frequent pair (5 words), then it extends
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    assert merges[2] == ("low", EOW)
    # deterministic: same corpus, same merges
    assert bpe_train(docs, n_merges=3) == merges


def test_apply_merges_and_counts(spark):
    docs = _docs(spark, "low lower low")
    merges = [("l", "o"), ("lo", "w"), ("low", EOW)]
    row = bpe_apply(docs, merges).collect()[0]
    # low -> [low</w>], lower -> [low, e, r, </w>], low -> [low</w>]
    assert row["bpe_tokens"] == ["low</w>", "low", "e", "r", EOW, "low</w>"]
    assert row["n_bpe_tokens"] == 6


def test_identical_token_runs_merge_leftmost(spark):
    """'aaaa' under merge (a,a) must give [aa, aa] and 'aaa' [aa, a] —
    greedy leftmost pairing. This is exactly the case a shared-delimiter
    encoding gets wrong (the replace scanner eats the boundary and skips
    the adjacent occurrence); the open/close wrapping makes matches
    character-disjoint, so replace-all IS the BPE pass."""
    docs = _docs(spark, "aaaa aaa")
    out = bpe_apply(docs, [("a", "a")]).collect()[0]
    assert out["bpe_tokens"] == ["aa", "aa", EOW, "aa", "a", EOW]


def test_consecutive_pair_occurrences_all_merge(spark):
    """'papa' under merge (p,a): both occurrences merge -> [pa, pa] —
    the other scanner-skip case the wrapped encoding fixes."""
    docs = _docs(spark, "papa papapa")
    out = bpe_apply(docs, [("p", "a")]).collect()[0]
    assert out["bpe_tokens"] == ["pa", "pa", EOW, "pa", "pa", "pa", EOW]


def test_empty_and_null_text(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, None), (2, "  ")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_apply(docs, [("a", "a")]).collect()}
    assert rows == {0: 0, 1: 0, 2: 0}


def test_train_stops_when_nothing_repeats(spark):
    docs = _docs(spark, "ab cd")
    # every pair occurs once -> count < 2 -> early stop, and the
    # fully-merged single-token guard must not blow up either
    merges = bpe_train(docs, n_merges=50)
    assert len(merges) < 50
