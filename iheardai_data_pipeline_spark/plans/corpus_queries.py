"""Catalog queries for the corpus-statistics operators (operators/corpus.py).

Each query pairs the Spark plan with a DuckDB oracle that recomputes the
same exact-integer arithmetic, so all four are full value-hash checks.
Tokenization mirrors the repo conventions: raw trimmed ``\\s+`` split for
word/bigram metrics (operators/text.py), normalized lower+collapse split
for shingles (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.functions.exact import sql_ratio_half_up
from iheardai_data_pipeline_spark.operators import corpus
from iheardai_data_pipeline_spark.plans.catalog import register
from iheardai_data_pipeline_spark.sources.batch import load_table

_WS_SPLIT = "string_split_regex(trim(text), '\\s+')"

# --- Gopher-style repetition filter ------------------------------------------------

# CTE chain ending in `m` (per-doc repetition metrics + implied keep
# inputs) — shared by the standalone query and the curation-v2 funnel.
_REPETITION_CTE = f"""base AS (SELECT doc_id, {_WS_SPLIT} AS a FROM documents),
w AS (SELECT doc_id, unnest(a) AS word FROM base),
wc AS (SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY doc_id, word),
wstats AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
         COUNT(*) AS n_distinct_words, CAST(MAX(c) AS BIGINT) AS top_c
  FROM wc GROUP BY doc_id
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(a) - 1, 0)),
                               i -> a[i] || ' ' || a[i + 1])) AS b
  FROM base
),
bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b),
bstats AS (
  SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bc, CAST(SUM(c) AS BIGINT) AS n_bigrams
  FROM bc GROUP BY doc_id
),
m AS (
  SELECT ws.doc_id, ws.n_words, ws.n_distinct_words,
         {sql_ratio_half_up("ws.n_words - ws.n_distinct_words", "ws.n_words", 6)} AS dup_word_frac,
         {sql_ratio_half_up("ws.top_c", "ws.n_words", 6)} AS top_word_frac,
         COALESCE({sql_ratio_half_up("bs.top_bc", "bs.n_bigrams", 6)}, 0.0) AS top_bigram_frac
  FROM wstats ws LEFT JOIN bstats bs ON ws.doc_id = bs.doc_id
)"""

_REPETITION_ORACLE = f"""
WITH {_REPETITION_CTE}
SELECT doc_id, n_words, n_distinct_words, dup_word_frac, top_word_frac,
       top_bigram_frac,
       (dup_word_frac <= 0.95 AND top_word_frac <= 0.1
        AND top_bigram_frac <= 0.18) AS keep
FROM m
ORDER BY doc_id
"""


@register(
    "x_text_gopher_repetition",
    oracle=_REPETITION_ORACLE,
    tags=("extension", "text", "quality"),
    doc="Gopher-style repetition filter (word-granular): duplicate-word, "
    "top-word, and top-bigram fractions with a keep flag. Word and "
    "bigram counts partial-agg on (doc, gram) before the per-doc "
    "rollup; exact HALF_UP ratios make the keep decision hash-stable.",
)
def x_text_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.repetition_metrics(load_table(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


# --- corpus unigram-LM scores ------------------------------------------------------

_LM_ORACLE = f"""
WITH w AS (SELECT doc_id, unnest({_WS_SPLIT}) AS word FROM documents),
dwc AS (SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY doc_id, word),
vocab AS (SELECT word, CAST(SUM(c) AS BIGINT) AS cc FROM dwc GROUP BY word),
tot AS (SELECT CAST(SUM(cc) AS BIGINT) AS n_corpus FROM vocab)
SELECT d.doc_id,
       CAST(SUM(d.c) AS BIGINT) AS n_tokens,
       {sql_ratio_half_up(
           "CAST(SUM(d.c * v.cc) AS BIGINT) * 1000000",
           "CAST(SUM(d.c) AS BIGINT) * ANY_VALUE(t.n_corpus)", 4)} AS mean_tok_fpm,
       {sql_ratio_half_up(
           "CAST(SUM(CASE WHEN v.cc < 5 THEN d.c ELSE 0 END) AS BIGINT)",
           "CAST(SUM(d.c) AS BIGINT)", 6)} AS rare_token_frac
FROM dwc d JOIN vocab v ON d.word = v.word, tot t
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


@register(
    "x_text_corpus_lm",
    oracle=_LM_ORACLE,
    tags=("extension", "text", "quality"),
    doc="Corpus-trained unigram-LM scores: mean token corpus-frequency "
    "(per million) and rare-token fraction per doc — the perplexity "
    "filter's deterministic cousin (exact rational, no log). The vocab "
    "aggregate derives from the already-reduced (doc,word) counts and "
    "joins back on the word key (broadcast-scale at 100 TB).",
)
def x_text_corpus_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.corpus_lm_scores(load_table(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


# --- temperature-based domain resampling -------------------------------------------

_TEMP_SAMPLE_ORACLE = """
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS w_s
  FROM documents GROUP BY source
),
consts AS (
  SELECT CAST(SUM(w_s) AS BIGINT) AS w_total,
         CAST(SUM(n_docs) AS BIGINT) * 1 // 2 AS t_target
  FROM counts
),
rates AS (
  SELECT c.source, c.n_docs,
         LEAST(1.0, CAST(t.t_target * c.w_s AS DOUBLE)
                    / CAST(t.w_total * c.n_docs AS DOUBLE)) AS p_s
  FROM counts c, consts t
),
kept AS (
  SELECT d.source, COUNT(*) AS n_sampled
  FROM documents d JOIN rates r ON d.source = r.source
  WHERE CAST(CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
             AS DOUBLE) / 1152921504606846976.0 < r.p_s
  GROUP BY d.source
)
SELECT r.source, r.n_docs, COALESCE(k.n_sampled, 0) AS n_sampled
FROM rates r LEFT JOIN kept k ON r.source = k.source
ORDER BY r.source
"""


@register(
    "x_mix_temperature_sample",
    oracle=_TEMP_SAMPLE_ORACLE,
    tags=("extension", "sampling", "mixing"),
    doc="Domain-temperature resampling (alpha=0.5): integer sqrt weights "
    "(exact weight total — no order-dependent float sum), per-source "
    "keep rate as ONE double division of int64 operands, md5-uniform "
    "deterministic keep test. Returns per-source n_docs vs n_sampled.",
)
def x_mix_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.temperature_sample(load_table(spark, sf_dir, "documents"))


# --- duplicate-shingle contamination ----------------------------------------------

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

_DUPSHINGLE_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS ws FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(ws) - 4, 0)),
                               i -> array_to_string(ws[i:i+4], ' '))) AS shingle
  FROM toks
),
sdf AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle)
SELECT sh.doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN sdf.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       {sql_ratio_half_up(
           "CAST(SUM(CASE WHEN sdf.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)",
           "COUNT(*)", 6)} AS dup_shingle_frac
FROM sh JOIN sdf ON sh.shingle = sdf.shingle
GROUP BY sh.doc_id
ORDER BY sh.doc_id
"""


@register(
    "x_text_dupshingle_frac",
    oracle=_DUPSHINGLE_ORACLE,
    tags=("extension", "dedup", "text"),
    doc="Per-doc duplicate-shingle fraction: share of a doc's distinct "
    "5-gram shingles that occur in >=1 other document — the doc-level "
    "contamination signal pairwise Jaccard misses. Shingle sets are "
    "row-local; the document-frequency aggregate partial-aggs before "
    "the join-back (xxhash64 keys on the production path at scale).",
)
def x_text_dupshingle_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.dup_shingle_stats(load_table(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


# --- curation funnel v2 (compose repetition gate -> exact dedup -> mix) ------------

_CURATION2_ORACLE = f"""
WITH {_REPETITION_CTE},
flags AS (
  SELECT doc_id,
         (dup_word_frac <= 0.95 AND top_word_frac <= 0.1
          AND top_bigram_frac <= 0.18) AS keep
  FROM m
),
quality AS (
  SELECT d.doc_id, d.source, d.text
  FROM documents d JOIN flags f ON d.doc_id = f.doc_id
  WHERE f.keep
),
fp AS (
  SELECT doc_id, source,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
  FROM quality
),
keepers AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY fingerprint),
survivors AS (
  SELECT fp.doc_id, fp.source FROM fp JOIN keepers k ON fp.doc_id = k.doc_id
),
counts AS (
  SELECT source, COUNT(*) AS n_unique,
         CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS w_s
  FROM survivors GROUP BY source
),
consts AS (
  SELECT CAST(SUM(w_s) AS BIGINT) AS w_total,
         CAST(SUM(n_unique) AS BIGINT) * 1 // 2 AS t_target
  FROM counts
),
rates AS (
  SELECT c.source, c.n_unique,
         LEAST(1.0, CAST(t.t_target * c.w_s AS DOUBLE)
                    / CAST(t.w_total * c.n_unique AS DOUBLE)) AS p_s
  FROM counts c, consts t
),
kept AS (
  SELECT s.source, COUNT(*) AS n_sampled
  FROM survivors s JOIN rates r ON s.source = r.source
  WHERE CAST(CAST('0x' || substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
             AS DOUBLE) / 1152921504606846976.0 < r.p_s
  GROUP BY s.source
),
n_input AS (SELECT source, COUNT(*) AS n_input FROM documents GROUP BY source),
n_quality AS (SELECT source, COUNT(*) AS n_quality FROM quality GROUP BY source)
SELECT i.source, i.n_input,
       COALESCE(q.n_quality, 0) AS n_quality,
       COALESCE(r.n_unique, 0) AS n_unique,
       COALESCE(k.n_sampled, 0) AS n_sampled
FROM n_input i
LEFT JOIN n_quality q ON i.source = q.source
LEFT JOIN rates r     ON i.source = r.source
LEFT JOIN kept k      ON i.source = k.source
ORDER BY i.source
"""


@register(
    "x_curation_funnel_v2",
    oracle=_CURATION2_ORACLE,
    tags=("extension", "pipeline", "dedup", "sampling"),
    doc="End-to-end curation funnel composing the round-3 operators: "
    "Gopher repetition gate -> exact-fingerprint dedup (min-doc_id "
    "keeper) -> domain-temperature resampling, reported as per-source "
    "funnel counts (n_input/n_quality/n_unique/n_sampled). Every stage "
    "reduces before the next; the whole funnel is one oracle-checked "
    "plan (operators/corpus.py:curation_funnel).",
)
def x_curation_funnel_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism

    # fan the single-split scan out once at the funnel mouth: the base
    # relation feeds the quality join + n_input rollup directly (the
    # stages that don't go through repetition_metrics' own fan-out)
    return corpus.curation_funnel(
        ensure_parallelism(load_table(spark, sf_dir, "documents"))
    )
