"""Byte-pair encoding, pure column expressions: distributed training +
an engine-portable apply.

Token-budget operators (shard packing, chunking) counted whitespace
tokens — a documented stand-in. This module makes the counts
production-faithful with REAL BPE while staying entirely JVM-side:

- **Representation**: every token is wrapped in DISTINCT open/close
  delimiters: ``O t C`` (``O`` = \\x01, ``C`` = \\x02 — never in text
  after normalization). A word is its wrapped chars plus a wrapped
  ``</w>`` marker; a word boundary inside a document is a wrapped \\x03
  token, which no merge pair can equal, so merges never span words.
- **One merge = one literal replace()**: merging pair (x, y) -> xy is
  ``replace(s, O+x+C+O+y+C, O+x+y+C)``. Because the pattern covers the
  two whole tokens EXACTLY (open to close — no delimiter shared with a
  neighboring occurrence), literal replace-all — leftmost
  non-overlapping, identical in Spark, DuckDB, and every other engine —
  IS the BPE one-pass-per-rank semantics, including consecutive
  occurrences (``papa``) and runs of identical tokens (``aaaa`` ->
  ``aa aa``, ``aaa`` -> ``aa a``). A shared single-delimiter encoding
  gets exactly those cases wrong: the replace scanner consumes the
  boundary and skips the adjacent occurrence (caught by test_bpe.py).
  The full apply is a CHAIN of ``n_merges`` scalar string ops: no UDF,
  no lambda, no shuffle, whole-stage-codegen friendly, and the DuckDB
  oracle replays the identical chain for a bit-exact value check.
- **Training** is the standard corpus loop, distributed: per round one
  vocabulary-sized adjacent-pair aggregation picks the max-count pair
  (count desc, pair asc — deterministic), then one narrow replace
  applies it; the loop state is the (distinct-word, count) relation,
  vocabulary-sized, never corpus-sized. The learned merge list is a
  bounded driver artifact (n_merges rows) — ship it like any tokenizer
  artifact and apply it anywhere.

At 100 TB: train on a vocabulary sample (the pair statistics converge
long before the full vocab is seen), pin the merge artifact, and apply
is embarrassingly parallel per document. Reference parity: the
reference counts tokens with a fixed external tokenizer
(text_agent_transformer's token fields); this is the in-engine
equivalent with the tokenizer itself trained and applied relationally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.operators.text import normalize_text
from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism, eval_once

O = "\x01"      # token OPEN delimiter
C = "\x02"      # token CLOSE delimiter (distinct from O: adjacent merge
                # matches must not share a character — see module doc)
SEP = "\x03"    # word-separator token (blocks cross-word merges)
EOW = "</w>"    # end-of-word marker token


def _char_tokens(word: Column) -> Column:
    """``O c1 C ... O cN C O EOW C`` for a single word (no spaces)."""
    return F.concat(
        F.regexp_replace(word, "(.)", O + "$1" + C), F.lit(O + EOW + C)
    )


def _doc_token_string(text: Column) -> Column:
    """Whole normalized document in wrapped-token form: every word
    char-split and EOW-terminated, word boundaries a wrapped SEP."""
    norm = normalize_text(text)
    s = F.concat(F.regexp_replace(norm, "(.)", O + "$1" + C), F.lit(O + EOW + C))
    # the space between words was wrapped as a token; rewrite it to
    # close the left word (EOW) and insert the boundary token
    s = F.replace(s, F.lit(O + " " + C), F.lit(O + EOW + C + O + SEP + C))
    return F.when(F.length(norm) > 0, s).otherwise(F.lit(""))


def _merge_chain(s: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply the merge list in rank order — one replace per merge."""
    for x, y in merges:
        s = F.replace(s, F.lit(O + x + C + O + y + C), F.lit(O + x + y + C))
    return s


def _tokens_from_string(s: Column) -> Column:
    # split on CLOSE -> elements 'O<token>'; strip the open byte, drop
    # the empty tail and word-boundary tokens
    return F.filter(
        F.transform(F.split(s, C), lambda e: F.substring(e, 2, 1_000_000)),
        lambda t: (t != "") & (t != SEP),
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 24,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Deterministic:
    ties break on the pair itself. Returns the ranked merge list.

    Each round: adjacent-pair explode over the DISTINCT-word relation
    (weighted by word frequency), one partial-agg shuffle on the 2-token
    pair key, a 1-row TakeOrdered collect, and one narrow replace.
    Rounds checkpoint so lineage stays flat.
    """
    words = (
        ensure_parallelism(docs.where(F.col(text_col).isNotNull()))
        .select(F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(_char_tokens(F.col("w")).alias("s"), "cnt")
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        toks = F.filter(
            F.transform(F.split("s", C), lambda e: F.substring(e, 2, 1_000_000)),
            lambda t: t != "",
        )
        # sequence(0, n-2) DESCENDS for fully-merged single-token words
        # (n=1): guard to an empty index list, as everywhere else
        idx = F.when(
            F.size(toks) >= 2, F.sequence(F.lit(0), F.size(toks) - 2)
        ).otherwise(F.array().cast("array<int>"))
        pair_rows = (
            words.select(
                F.explode(
                    F.transform(
                        idx,
                        lambda i: F.struct(
                            F.element_at(toks, i + 1).alias("x"),
                            F.element_at(toks, i + 2).alias("y"),
                        ),
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.x", "p.y")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), "x", "y")
            .limit(1)
            .collect()
        )
        if not pair_rows or pair_rows[0]["n"] < 2:
            break
        x, y = pair_rows[0]["x"], pair_rows[0]["y"]
        merges.append((x, y))
        words = words.withColumn(
            "s", F.replace("s", F.lit(O + x + C + O + y + C), F.lit(O + x + y + C))
        ).localCheckpoint()
    return merges


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """All input columns + ``bpe_tokens`` (array<string>, EOW-merged
    tokens included) + ``n_bpe_tokens``. The merge chain is one linear
    scalar-expression pipeline per row — narrow, no shuffle."""
    out = eval_once(
        ensure_parallelism(docs),
        __bpe=_tokens_from_string(
            _merge_chain(_doc_token_string(F.col(text_col)), merges)
        ),
    )
    return out.withColumn("bpe_tokens", F.col("__bpe")).withColumn(
        "n_bpe_tokens", F.size("__bpe").cast("long")
    ).drop("__bpe")


def merge_chain_sql(expr: str, merges: list[tuple[str, str]]) -> str:
    """The identical merge chain as portable SQL over ``expr`` — used to
    generate the DuckDB oracle from the same pinned merge artifact."""

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    for x, y in merges:
        expr = f"replace({expr}, {q(O + x + C + O + y + C)}, {q(O + x + y + C)})"
    return expr


def doc_token_string_sql(norm_expr: str) -> str:
    """DuckDB mirror of _doc_token_string over a normalized-text SQL
    expression (RE2 replacement backref is \\1, not $1)."""
    s = (
        f"regexp_replace({norm_expr}, '(.)', '{O}\\1{C}', 'g') || '{O}{EOW}{C}'"
    )
    s = f"replace({s}, '{O} {C}', '{O}{EOW}{C}{O}{SEP}{C}')"
    return f"CASE WHEN length({norm_expr}) > 0 THEN {s} ELSE '' END"


def tokens_sql(s_expr: str) -> str:
    return (
        f"list_filter(list_transform(string_split({s_expr}, '{C}'), "
        f"e -> e[2:]), t -> t <> '' AND t <> '{SEP}')"
    )
