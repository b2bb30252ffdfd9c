"""Unigram-LM (SentencePiece-style) subword tokenizer — distributed
hard-EM training + an exact-integer Viterbi apply.

The module completes the tokenizer family beside :mod:`bpe`: where BPE
greedily merges the most frequent adjacent pair, the unigram LM keeps a
piece VOCABULARY with scores and segments every word into its single
best-scoring piece sequence (Kudo 2018's model, with Viterbi "hard" EM
instead of full forward-backward — the standard deterministic variant).

Exactness is the design center, same discipline as the PageRank /
z-test / PQ entries: piece scores are **BIGINT micro-log-units**
(``round(1e6 * ln(count))``, computed ONCE when the artifact is pinned
— the score table IS the shipped tokenizer), so Viterbi is pure integer
max-plus arithmetic with total tie-orders and replays bit-identically
in any engine. No floats ever enter the distributed plan.

Viterbi, distributed and JVM-side:

- segmentation runs over the **distinct-word relation** (vocabulary-
  sized, never corpus-sized) and joins back to documents — the same
  shape as ``bpe_train``'s state;
- each word builds a per-row ``map<int,bigint>`` of matched-piece
  scores (one explode of ``O(|w| * max_piece_len)`` span structs, one
  broadcast join against the piece table — piece scores are data, not
  expression literals, so codegen size is constant in vocab size: the
  Janino blow-up a 50k-piece ``create_map`` literal would hit);
- the DP is TWO ``aggregate`` folds per word (forward best/backpointer
  arrays, then backtrack) — constant expression size, whole-stage
  codegen, zero Python;
- every single character is always a valid piece (unknown characters
  fall back to ``UNK_SCORE``), so every position is reachable and no
  -infinity bookkeeping is needed.

Tie-breaks (total order, both engines): maximize integer score sum,
ties to the LONGER piece at each DP position.

At 100 TB: train on a vocabulary sample, pin the (piece, score)
artifact (``plans/unigram_artifact.py``), apply embarrassingly
parallel per document with one small broadcast — identical posture to
the BPE merge list.

Reference parity: the reference counts tokens with a fixed external
tokenizer (text_agent_transformer's token fields); this is the second
in-engine tokenizer, trained and applied relationally.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.operators.text import normalize_text
from iheardai_data_pipeline_spark.sources.batch import (
    ensure_parallelism,
    eval_once,
)

# score for a single character absent from the piece table: far below
# any trained piece (log-probability scores bottom out around
# -ln(total) ~ -20e6 micro-units for any plausible corpus) so unknowns
# are used only when no trained piece covers the position, but finite
# so every word still segments
UNK_SCORE = -40_000_000

# spans are keyed start0 * KEY_STRIDE + len; piece lengths must stay
# below the stride
KEY_STRIDE = 16
MAX_PIECE_LEN = 6

_NEG_INF = -(1 << 62)


def score_table(freqs: list[tuple[str, int]]) -> list[tuple[str, int]]:
    """Freeze (piece, count) rows into the integer score artifact:
    ``round_half_up(1e6 * ln(count / total))`` — log PROBABILITIES, so
    scores are negative and every extra piece costs (with raw log-
    counts, all-singles segmentations would always win: the unigram LM
    objective is the product of piece probabilities). Run ONCE at
    artifact-pinning time — after this, no floats exist anywhere."""
    kept = [(p, c) for p, c in freqs if c >= 1]
    if not kept:
        raise ValueError(
            "score_table: no piece has count >= 1 — an empty/all-zero "
            "frequency list cannot define a unigram LM (every score "
            "would be log(0))"
        )
    log_total = math.log(sum(c for _, c in kept))
    return sorted(
        (
            p,
            int(math.floor(1_000_000 * (math.log(c) - log_total) + 0.5)),
        )
        for p, c in kept
    )


def _pieces_df(df_or_spark, pieces: list[tuple[str, int]]) -> DataFrame:
    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    return spark.createDataFrame(pieces, "piece string, score long")


def _span_structs(w: Column, max_len: int) -> Column:
    """All (key, piece) span candidates of ``w``: key = start0 * 16 + l."""
    return F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.length(w) - 1),
            lambda s: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_len), F.length(w) - s)
                ),
                lambda l: F.struct(
                    (s * KEY_STRIDE + l).cast("int").alias("k"),
                    F.substring(w, s + 1, l).alias("piece"),
                ),
            ),
        )
    )


def _word_score_maps(
    words: DataFrame, pieces: DataFrame, max_len: int
) -> DataFrame:
    """(w) -> (w, m: map<int,bigint>) of every matched span's score."""
    spans = words.select(
        "w", F.explode(_span_structs(F.col("w"), max_len)).alias("sp")
    ).select("w", "sp.k", "sp.piece")
    matched = (
        spans.join(F.broadcast(pieces), "piece")
        .groupBy("w")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("k", "score"))
            ).alias("m")
        )
    )
    return words.join(matched, "w", "left").select(
        "w",
        F.coalesce(
            "m", F.expr("cast(map() as map<int,bigint>)")
        ).alias("m"),
    )


def _viterbi_tokens(w: Column, m: Column, max_len: int) -> Column:
    """Best integer-score segmentation of ``w`` given span-score map
    ``m`` — forward DP fold + backtrack fold, all column expressions."""
    n = F.length(w)

    def step(acc, j):
        # best candidate over piece length l = 1..min(max_len, j):
        # max by (score_sum, l) — ties prefer the longer piece
        cand = F.aggregate(
            F.sequence(F.lit(1), F.least(F.lit(max_len), j)),
            F.struct(
                F.lit(_NEG_INF).cast("long").alias("s"),
                F.lit(0).cast("int").alias("l"),
            ),
            lambda a, l: F.when(
                (
                    tot := F.element_at(acc["best"], j - l + 1)
                    + F.coalesce(
                        F.element_at(m, ((j - l) * KEY_STRIDE + l).cast("int")),
                        F.when(l == 1, F.lit(UNK_SCORE).cast("long")),
                    )
                ).isNotNull()
                & ((tot > a["s"]) | ((tot == a["s"]) & (l > a["l"]))),
                F.struct(tot.alias("s"), l.cast("int").alias("l")),
            ).otherwise(a),
        )
        return F.struct(
            F.concat(acc["best"], F.array(cand["s"])).alias("best"),
            F.concat(acc["lens"], F.array(cand["l"])).alias("lens"),
        )

    fwd = F.aggregate(
        F.sequence(F.lit(1), n),
        F.struct(
            F.array(F.lit(0).cast("long")).alias("best"),
            F.array().cast("array<int>").alias("lens"),
        ),
        step,
    )

    def back(acc, _):
        ln = F.element_at(fwd["lens"], acc["pos"])
        return F.when(
            acc["pos"] > 0,
            F.struct(
                (acc["pos"] - ln).alias("pos"),
                F.concat(
                    F.array(F.substring(w, acc["pos"] - ln + 1, ln)),
                    acc["parts"],
                ).alias("parts"),
            ),
        ).otherwise(acc)

    walked = F.aggregate(
        F.sequence(F.lit(1), n),
        F.struct(
            n.cast("int").alias("pos"),
            F.array().cast("array<string>").alias("parts"),
        ),
        back,
    )
    return F.when(n > 0, walked["parts"]).otherwise(
        F.array().cast("array<string>")
    )


def _tokens_score(tokens: Column, m: Column) -> Column:
    """Total integer score of an already-chosen segmentation: fold the
    tokens left to right tracking the character position, looking each
    piece's score back up in the span map (missing keys can only be
    unknown single characters — every multi-char token was emitted
    BECAUSE its span was in the map — so the coalesce is exactly the
    DP's UNK fallback). O(tokens) per row, so the word's LM score
    costs a fraction of re-running the DP for it."""
    folded = F.aggregate(
        tokens,
        F.struct(
            F.lit(0).cast("int").alias("pos"),
            F.lit(0).cast("long").alias("s"),
        ),
        lambda a, t: F.struct(
            (a["pos"] + F.length(t)).cast("int").alias("pos"),
            (
                a["s"]
                + F.coalesce(
                    F.element_at(
                        m,
                        (a["pos"] * KEY_STRIDE + F.length(t)).cast("int"),
                    ),
                    F.lit(UNK_SCORE).cast("long"),
                )
            ).alias("s"),
        ),
    )
    return folded["s"]


def viterbi_segment(
    words: DataFrame,
    pieces: list[tuple[str, int]],
    max_len: int = MAX_PIECE_LEN,
) -> DataFrame:
    """(w) -> (w, tokens array<string>, w_score bigint) — best unigram
    segmentation of each distinct word under the integer score table,
    plus its total log-probability in micro-units (the DP's own
    maximized objective, recovered from the chosen tokens)."""
    pdf = _pieces_df(words, pieces)
    wm = _word_score_maps(words.select("w").distinct(), pdf, max_len)
    segged = eval_once(
        wm, tokens=_viterbi_tokens(F.col("w"), F.col("m"), max_len)
    )
    return segged.select(
        "w",
        "tokens",
        _tokens_score(F.col("tokens"), F.col("m")).alias("w_score"),
    )


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 160,
    seed_size: int = 512,
    n_iters: int = 2,
    max_len: int = MAX_PIECE_LEN,
) -> list[tuple[str, int]]:
    """Learn the (piece, score) table by Viterbi hard-EM.

    Seed = the ``seed_size`` most document-frequent substrings (length
    <= ``max_len``) of the distinct-word relation plus EVERY single
    character (coverage guarantee); each EM round re-segments the
    distinct words under the current integer scores, recounts pieces
    from the segmentations (exact integers, weighted by word
    frequency), prunes to ``vocab_size`` multi-char pieces + all
    singles, and refreezes scores. Deterministic: all ranking ties
    break on the piece string.
    """
    words = (
        ensure_parallelism(docs.where(F.col(text_col).isNotNull()))
        .select(
            F.explode(
                F.split(normalize_text(F.col(text_col)), " ")
            ).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )

    def freeze(freq_rows: list[tuple[str, int]]) -> list[tuple[str, int]]:
        return score_table(freq_rows)

    spans = words.select(
        F.explode(_span_structs(F.col("w"), max_len)).alias("sp"), "cnt"
    ).select(F.col("sp.piece").alias("piece"), "cnt")
    by_piece = spans.groupBy("piece").agg(F.sum("cnt").alias("n"))
    singles = [
        (r["piece"], int(r["n"]))
        for r in by_piece.where(F.length("piece") == 1).collect()
    ]
    multi = [
        (r["piece"], int(r["n"]))
        for r in by_piece.where(F.length("piece") >= 2)
        .orderBy(F.desc("n"), "piece")
        .limit(seed_size)
        .collect()
    ]
    pieces = freeze(singles + multi)

    for _ in range(n_iters):
        seg = viterbi_segment(words, pieces, max_len).join(words, "w")
        counts = (
            seg.select(F.explode("tokens").alias("piece"), "cnt")
            .groupBy("piece")
            .agg(F.sum("cnt").alias("n"))
        )
        rows = counts.collect()  # bounded: <= seed_size + singles
        single_rows = [
            (r["piece"], int(r["n"])) for r in rows if len(r["piece"]) == 1
        ]
        # singles never leave the vocab (coverage); unused ones keep
        # count 1, which under log-probability freezing scores
        # -round(1e6 * ln(total)) micro-units — the vocab's floor for a
        # trained piece (cheaper than UNK, dearer than anything used)
        seen_singles = {p for p, _ in single_rows}
        single_rows += [
            (p, 1) for p, _ in singles if p not in seen_singles
        ]
        multi_rows = sorted(
            ((r["piece"], int(r["n"])) for r in rows if len(r["piece"]) >= 2),
            key=lambda t: (-t[1], t[0]),
        )[:vocab_size]
        pieces = freeze(single_rows + multi_rows)
    return pieces


def unigram_apply(
    docs: DataFrame,
    pieces: list[tuple[str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_len: int = MAX_PIECE_LEN,
) -> DataFrame:
    """(id, ...) -> (id, n_unigram_tokens bigint, unigram_text string,
    neg_logprob_micro bigint) — every word segmented by the pinned
    integer Viterbi, document reassembled in word order, plus the
    document's total negative log-probability under the unigram LM in
    exact micro-units (sum over word occurrences of the DP's maximized
    score, negated). Documents whose normalized text is empty are
    dropped (no tokens to emit). Distributed shape: one posexplode,
    Viterbi over the DISTINCT words only, one join back, one per-doc
    ordered fold."""
    base = ensure_parallelism(docs.where(F.col(text_col).isNotNull()))
    wx = base.select(
        id_col,
        F.posexplode(
            F.split(normalize_text(F.col(text_col)), " ")
        ).alias("widx", "w"),
    ).where(F.col("w") != "")
    seg = viterbi_segment(wx.select("w"), pieces, max_len)
    return (
        wx.join(seg, "w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("widx", "tokens"))
                    ),
                    lambda s: s["tokens"],
                )
            ).alias("__toks"),
            (-F.sum("w_score")).cast("long").alias("neg_logprob_micro"),
        )
        .select(
            id_col,
            F.size("__toks").cast("long").alias("n_unigram_tokens"),
            F.concat_ws(" ", "__toks").alias("unigram_text"),
            "neg_logprob_micro",
        )
    )


# --- DuckDB oracle generators -------------------------------------------------


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def pieces_values_sql(pieces: list[tuple[str, int]]) -> str:
    rows = ", ".join(
        f"({_sql_quote(p)}, CAST({s} AS BIGINT))" for p, s in pieces
    )
    return f"(VALUES {rows})"


def viterbi_ctes_sql(
    pieces: list[tuple[str, int]],
    norm_docs_cte: str,
    max_len: int = MAX_PIECE_LEN,
) -> str:
    """The full replay: given a CTE body ``norm_docs_cte`` producing
    (doc_id, norm), emit the WITH-chain (caller prepends
    ``WITH RECURSIVE``) whose final CTE ``u_out`` yields
    (doc_id, n_unigram_tokens, unigram_text) — the bit-identical
    integer Viterbi (same span keys, same max-by-(score, length)
    tie-break, same UNK fallback) as :func:`unigram_apply`."""
    return f"""
u_pieces(piece, score) AS ({pieces_values_sql(pieces)}),
u_docs AS ({norm_docs_cte}),
u_wx AS (
  SELECT doc_id, CAST(t.i AS INT) AS widx, ws[CAST(t.i AS INT)] AS w
  FROM (SELECT doc_id, string_split(norm, ' ') AS ws FROM u_docs
        WHERE norm <> ''),
       UNNEST(range(1, len(ws) + 1)) AS t(i)
  WHERE ws[CAST(t.i AS INT)] <> ''
),
u_wd AS (SELECT DISTINCT w FROM u_wx),
u_spans AS (
  SELECT d.w,
         CAST(s.s0 * {KEY_STRIDE} + l.l AS INT) AS k,
         p.score
  FROM u_wd d,
       UNNEST(range(0, len(d.w))) AS s(s0),
       UNNEST(range(1, least({max_len}, len(d.w) - s.s0) + 1)) AS l(l),
       u_pieces p
  WHERE p.piece = substr(d.w, CAST(s.s0 AS INT) + 1, CAST(l.l AS INT))
),
u_maps AS (SELECT w, map(list(k), list(score)) AS m
           FROM u_spans GROUP BY w),
u_wm AS (
  SELECT d.w,
         coalesce(m.m, map(CAST([] AS INT[]), CAST([] AS BIGINT[]))) AS m
  FROM u_wd d LEFT JOIN u_maps m USING (w)
),
u_vit(w, j, best, lens) AS (
  SELECT w, 0, [CAST(0 AS BIGINT)], CAST([] AS INT[]) FROM u_wm
  UNION ALL
  SELECT v.w, v.j + 1,
    list_append(v.best, -(c.c).ns),
    list_append(v.lens, CAST(-(c.c).nl AS INT))
  FROM u_vit v
  JOIN u_wm wm ON wm.w = v.w,
  LATERAL (SELECT list_sort(list_filter(
    list_transform(range(1, least({max_len}, v.j + 1) + 1), l ->
      struct_pack(
        ns := -(v.best[v.j + 2 - CAST(l AS INT)]
          + coalesce(
              map_extract(wm.m,
                CAST((v.j + 1 - CAST(l AS INT)) * {KEY_STRIDE}
                     + CAST(l AS INT) AS INT))[1],
              CASE WHEN l = 1 THEN CAST({UNK_SCORE} AS BIGINT)
                   ELSE NULL END)),
        nl := -l)),
    x -> x.ns IS NOT NULL))[1] AS c) AS c
  WHERE v.j + 1 <= len(v.w)
),
u_fin AS (SELECT w, lens, best[len(w) + 1] AS wscore
          FROM u_vit WHERE j = len(w)),
u_walk(w, pos, parts) AS (
  SELECT w, CAST(len(w) AS INT), CAST([] AS VARCHAR[]) FROM u_fin
  UNION ALL
  SELECT k.w,
         k.pos - f.lens[k.pos],
         list_prepend(
           substr(k.w, k.pos - f.lens[k.pos] + 1, f.lens[k.pos]),
           k.parts)
  FROM u_walk k JOIN u_fin f USING (w)
  WHERE k.pos > 0
),
u_seg AS (SELECT w, parts FROM u_walk WHERE pos = 0),
u_out AS (
  SELECT x.doc_id,
    CAST(SUM(len(s.parts)) AS BIGINT) AS n_unigram_tokens,
    array_to_string(flatten(list(s.parts ORDER BY x.widx)), ' ')
      AS unigram_text,
    CAST(SUM(-f.wscore) AS BIGINT) AS neg_logprob_micro
  FROM u_wx x
  JOIN u_seg s ON s.w = x.w
  JOIN u_fin f ON f.w = x.w
  GROUP BY x.doc_id
)"""
