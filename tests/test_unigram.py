"""Unigram-LM tokenizer: integer Viterbi vs a Python reference,
training determinism, coverage, and the DuckDB replay."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.operators.unigram import (
    KEY_STRIDE,
    MAX_PIECE_LEN,
    UNK_SCORE,
    score_table,
    unigram_apply,
    unigram_train,
    viterbi_ctes_sql,
    viterbi_segment,
)


def ref_viterbi(w: str, scores: dict[str, int], max_len: int) -> list[str]:
    """Reference DP: maximize integer score sum, ties -> longer piece."""
    n = len(w)
    best = [0] + [None] * n
    lens = [0] * (n + 1)
    for j in range(1, n + 1):
        top = None
        for l in range(1, min(max_len, j) + 1):
            piece = w[j - l : j]
            sc = scores.get(piece)
            if sc is None and l == 1:
                sc = UNK_SCORE
            if sc is None:
                continue
            tot = best[j - l] + sc
            if top is None or tot > top[0] or (tot == top[0] and l > top[1]):
                top = (tot, l)
        best[j], lens[j] = top
    parts, pos = [], n
    while pos > 0:
        parts.insert(0, w[pos - lens[pos] : pos])
        pos -= lens[pos]
    return parts


PIECES = score_table(
    [
        ("h", 4), ("e", 9), ("l", 7), ("o", 6), ("w", 3), ("r", 5),
        ("d", 4), ("he", 8), ("ll", 6), ("hell", 5), ("lo", 4),
        ("wor", 7), ("ld", 7), ("hello", 30), ("owo", 2),
    ]
)
SCORES = dict(PIECES)


@pytest.mark.parametrize(
    "word",
    ["hello", "world", "helloworld", "hehe", "lll", "xyz", "hellold", "o"],
)
def test_viterbi_matches_python_reference(spark, word):
    out = viterbi_segment(
        spark.createDataFrame([(word,)], "w string"), PIECES
    ).collect()
    assert out[0]["tokens"] == ref_viterbi(word, SCORES, MAX_PIECE_LEN)


def test_viterbi_prefers_higher_score_then_longer(spark):
    # 'hello' as one piece scores ln(30) > any split; 'hellold' must
    # pick hello+ld over hell+lo+... exactly as the reference does
    rows = {
        r["w"]: r["tokens"]
        for r in viterbi_segment(
            spark.createDataFrame(
                [("hello",), ("hellold",)], "w string"
            ),
            PIECES,
        ).collect()
    }
    assert rows["hello"] == ["hello"]
    assert rows["hellold"] == ref_viterbi("hellold", SCORES, MAX_PIECE_LEN)


def test_unknown_chars_fall_back_to_singles(spark):
    out = viterbi_segment(
        spark.createDataFrame([("q#z",)], "w string"), PIECES
    ).collect()
    assert out[0]["tokens"] == ["q", "#", "z"]


def test_apply_reassembles_in_word_order(spark):
    docs = spark.createDataFrame(
        [(1, "Hello  WORLD"), (2, "world hello"), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in unigram_apply(docs, PIECES).collect()
    }
    assert set(rows) == {1, 2}  # empty/null docs dropped
    assert rows[1]["unigram_text"] == "hello wor ld"
    assert rows[2]["unigram_text"] == "wor ld hello"
    assert rows[1]["n_unigram_tokens"] == 3


def test_train_is_deterministic_and_covers_all_chars(spark):
    docs = spark.createDataFrame(
        [(i, f"banana band bandana b{i % 3}") for i in range(40)],
        "doc_id long, text string",
    )
    p1 = unigram_train(docs, vocab_size=8, seed_size=32, n_iters=2)
    p2 = unigram_train(docs, vocab_size=8, seed_size=32, n_iters=2)
    assert p1 == p2
    vocab = {p for p, _ in p1}
    chars = {c for c in "banana band bandana b0 b1 b2" if c != " "}
    assert chars <= vocab  # every single char survives pruning
    assert any(len(p) >= 2 for p in vocab)  # learned multi-char pieces


def test_duckdb_replay_matches_engine(spark):
    docs = [
        (1, "hello world"),
        (2, "helloworld hehe"),
        (3, "xyz hello"),
        (4, "lll owo"),
    ]
    sdf = unigram_apply(
        spark.createDataFrame(docs, "doc_id long, text string"), PIECES
    )
    got = sorted(
        (
            r["doc_id"],
            r["n_unigram_tokens"],
            r["unigram_text"],
            r["neg_logprob_micro"],
        )
        for r in sdf.collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {t!r})" for i, t in docs)
        + ") AS t(doc_id, text)"
    )
    norm = (
        "SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', "
        "'g')) AS norm FROM documents WHERE text IS NOT NULL"
    )
    sql = (
        "WITH RECURSIVE "
        + viterbi_ctes_sql(PIECES, norm).lstrip()
        + " SELECT doc_id, n_unigram_tokens, unigram_text,"
        "   neg_logprob_micro FROM u_out"
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_plan_size_constant_in_vocab(spark):
    """The module's 100 TB claim (unigram.py docstring): piece scores
    ship as broadcast DATA (a joined relation), never as literal SQL,
    so codegen/plan size is CONSTANT in vocab size — a 50k-piece map
    literal would hit Janino's 64KB method wall. Pin it: apply with a
    ~4,000-piece table must plan essentially the same text as the
    55-piece shipped artifact (same exchange count, plan length within
    noise) and must EXECUTE correctly (tokens match the Python
    reference DP under the big table)."""
    import itertools
    import string

    from iheardai_data_pipeline_spark.operators.unigram import unigram_apply
    from iheardai_data_pipeline_spark.plans.unigram_artifact import (
        UNIGRAM_PIECES,
    )

    letters = string.ascii_lowercase
    big_freqs = [(c, 50) for c in letters]
    big_freqs += [
        (a + b, 40) for a, b in itertools.product(letters, repeat=2)
    ]  # 676 bigrams
    big_freqs += [
        (a + b + c, 30)
        for a, b, c in itertools.product(letters[:15], repeat=3)
    ]  # 3375 trigrams
    big = score_table(big_freqs)
    assert len(big) > 4000 and len(UNIGRAM_PIECES) < 100  # ~73x vocab

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "abc defgh")], "doc_id long, text string"
    )

    def planned(pieces):
        df = unigram_apply(docs, pieces)
        return df, df._jdf.queryExecution().executedPlan().toString()

    df_small, plan_small = planned(UNIGRAM_PIECES)
    df_big, plan_big = planned(big)
    # flat exchange count and no vocab-proportional plan growth: a
    # 73x vocab must not grow the plan text by even 20% (the pieces
    # appear as a LocalTableScan relation, not as inline literals)
    assert plan_big.count("Exchange") == plan_small.count("Exchange")
    assert len(plan_big) < 1.2 * len(plan_small) + 2048
    # and the big-vocab plan actually executes (no Janino blowup),
    # matching the reference DP
    got = {
        r["doc_id"]: r["unigram_text"] for r in df_big.collect()
    }
    big_scores = dict(big)
    want = {
        did: " ".join(
            t
            for w in txt.split()
            for t in ref_viterbi(w, big_scores, MAX_PIECE_LEN)
        )
        for did, txt in ((1, "hello world"), (2, "abc defgh"))
    }
    assert got == want


def test_score_table_rejects_empty_and_all_zero():
    """An empty/all-zero frequency list must fail with a descriptive
    ValueError, not a bare math-domain error from log(0) (ADVICE r9)."""
    with pytest.raises(ValueError, match="count >= 1"):
        score_table([])
    with pytest.raises(ValueError, match="count >= 1"):
        score_table([("a", 0), ("b", 0)])


def test_key_stride_bounds_piece_len():
    assert MAX_PIECE_LEN < KEY_STRIDE


def test_word_scores_match_dp_objective(spark):
    """w_score recovered from the chosen tokens equals the DP's own
    maximized objective (the Python reference's best[n])."""
    words = ["hello", "helloworld", "xyz", "q#z", "lll"]
    got = {
        r["w"]: r["w_score"]
        for r in viterbi_segment(
            spark.createDataFrame([(w,) for w in words], "w string"),
            PIECES,
        ).collect()
    }
    for w in words:
        toks = ref_viterbi(w, SCORES, MAX_PIECE_LEN)
        want = sum(SCORES.get(t, UNK_SCORE) for t in toks)
        assert got[w] == want, w


def test_doc_neg_logprob_sums_word_occurrences(spark):
    docs = spark.createDataFrame(
        [(1, "hello hello xyz")], "doc_id long, text string"
    )
    row = unigram_apply(docs, PIECES).collect()[0]
    per_word = {
        w: sum(SCORES.get(t, UNK_SCORE) for t in ref_viterbi(w, SCORES, MAX_PIECE_LEN))
        for w in ("hello", "xyz")
    }
    want = -(2 * per_word["hello"] + per_word["xyz"])
    assert row["neg_logprob_micro"] == want


def test_property_viterbi_matches_reference_random(spark):
    """Randomized pin: Viterbi over random vocabularies and words must
    match the Python reference exactly — one Spark frame for ALL cases
    (the hypothesis-per-example-DataFrame pattern is too slow; a fixed
    seeded sample buys the same coverage deterministically)."""
    import random

    rng = random.Random(20260815)
    alphabet = "abcd"
    cases = []
    for case in range(6):
        vocab = {c: rng.randint(1, 50) for c in alphabet}
        for _ in range(rng.randint(2, 10)):
            ln = rng.randint(2, MAX_PIECE_LEN)
            piece = "".join(rng.choice(alphabet) for _ in range(ln))
            vocab[piece] = rng.randint(1, 200)
        pieces = score_table(sorted(vocab.items()))
        scores = dict(pieces)
        words = list(
            {
                "".join(
                    rng.choice(alphabet + "xz")
                    for _ in range(rng.randint(1, 14))
                )
                for _ in range(12)
            }
        )
        cases.append((pieces, scores, words))
    for i, (pieces, scores, words) in enumerate(cases):
        got = {
            r["w"]: (r["tokens"], r["w_score"])
            for r in viterbi_segment(
                spark.createDataFrame([(w,) for w in words], "w string"),
                pieces,
            ).collect()
        }
        for w in words:
            toks = ref_viterbi(w, scores, MAX_PIECE_LEN)
            score = sum(scores.get(t, UNK_SCORE) for t in toks)
            assert got[w] == (toks, score), (i, w, got[w], toks)
