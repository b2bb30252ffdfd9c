"""Catalog queries exercising the scalar transform layer (SURVEY §2.4)
against the driver's tables, each with a DuckDB oracle.

documents.text plays the response_text role (P35-P38 content analysis);
events.props plays the JSONB/semi-structured role; customer plays the
lead-scoring role (P11 family: map lookup + when-chain + cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.functions import text_agent as ta
from iheardai_data_pipeline_spark.functions.common import redact_pii
from iheardai_data_pipeline_spark.plans.catalog import register
from iheardai_data_pipeline_spark.sources.batch import load_table

# --- P35 content stats -------------------------------------------------------

_P35_ORACLE = """
SELECT
    doc_id,
    length(text) AS response_length,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(string_split_regex(trim(text), '\\s+')) END AS word_count,
    CAST(length(text) - length(replace(text, '.', ''))
       + length(text) - length(replace(text, '!', ''))
       + length(text) - length(replace(text, '?', '')) AS INT) AS sentence_count,
    contains(text, '```') AS has_code_blocks,
    contains(text, 'http') AS has_links
FROM documents
ORDER BY doc_id
"""


@register(
    "p35_text_stats",
    oracle=_P35_ORACLE,
    tags=("transform", "text"),
    doc="P35 content stats over documents.text (reference "
    "text_agent_transformer.py:181-198).",
)
def p35_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.length(t).alias("response_length"),
        ta.word_count(t).alias("word_count"),
        ta.sentence_count(t).alias("sentence_count"),
        t.contains("```").alias("has_code_blocks"),
        t.contains("http").alias("has_links"),
    ).orderBy("doc_id")


# --- P36 language detection ---------------------------------------------------

def _hits_sql(vocab: tuple[str, ...]) -> str:
    arr = ", ".join(f"'{w}'" for w in vocab)
    return (
        "len(list_filter(string_split_regex(lower(trim(text)), '\\s+')[1:50], "
        f"w -> list_contains([{arr}], w)))"
    )


_P36_ORACLE = f"""
WITH scored AS (
    SELECT doc_id,
        {_hits_sql(ta.ENGLISH_WORDS)} AS eng,
        {_hits_sql(ta.SPANISH_WORDS)} AS spa,
        {_hits_sql(ta.FRENCH_WORDS)} AS fra,
        length(text) AS n
    FROM documents
)
SELECT doc_id,
    CASE WHEN n = 0 THEN 'unknown'
         WHEN eng >= spa AND eng >= fra THEN 'english'
         WHEN spa > fra THEN 'spanish'
         WHEN fra > 0 THEN 'french'
         ELSE 'unknown' END AS language
FROM scored
ORDER BY doc_id
"""


@register(
    "p36_language_detect",
    oracle=_P36_ORACLE,
    tags=("transform", "text"),
    doc="P36 stopword-vote language id over documents.text (reference "
    "text_agent_transformer.py:200-224).",
)
def p36_language_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", ta.detect_language(F.col("text")).alias("language")
    ).orderBy("doc_id")


# --- P37 sentiment -------------------------------------------------------------

def _contain_count_sql(vocab: tuple[str, ...]) -> str:
    terms = " + ".join(
        f"CASE WHEN contains(lower(text), '{w}') THEN 1 ELSE 0 END" for w in vocab
    )
    return f"({terms})"


_P37_ORACLE = f"""
WITH scored AS (
    SELECT doc_id,
        {_contain_count_sql(ta.POSITIVE_WORDS)} AS pos,
        {_contain_count_sql(ta.NEGATIVE_WORDS)} AS neg,
        length(text) AS n
    FROM documents
)
SELECT doc_id,
    CASE WHEN n = 0 THEN 'neutral'
         WHEN pos > neg THEN 'positive'
         WHEN neg > pos THEN 'negative'
         ELSE 'neutral' END AS sentiment
FROM scored
ORDER BY doc_id
"""


@register(
    "p37_sentiment",
    oracle=_P37_ORACLE,
    tags=("transform", "text"),
    doc="P37 keyword sentiment over documents.text (reference "
    "text_agent_transformer.py:226-243).",
)
def p37_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", ta.sentiment(F.col("text")).alias("sentiment")).orderBy(
        "doc_id"
    )


# --- P38 topics -----------------------------------------------------------------

def _topics_sql() -> str:
    cases = []
    for topic, kws in ta.TOPIC_KEYWORDS.items():
        cond = " OR ".join(f"contains(lower(text), '{w}')" for w in kws)
        cases.append(f"CASE WHEN {cond} THEN '{topic}' END")
    arr = ", ".join(cases)
    return (
        f"list_filter([{arr}], x -> x IS NOT NULL)"
    )


_P38_ORACLE = f"""
SELECT doc_id,
    CASE WHEN length(text) = 0 THEN ''
         WHEN len({_topics_sql()}) = 0 THEN 'general'
         ELSE array_to_string({_topics_sql()}, ',') END AS topics_str
FROM documents
ORDER BY doc_id
"""


@register(
    "p38_topics",
    oracle=_P38_ORACLE,
    tags=("transform", "text"),
    doc="P38 keyword topic tags over documents.text, joined to a string "
    "for hash-stable comparison (reference text_agent_transformer.py:245-267).",
)
def p38_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.array_join(ta.topics(F.col("text")), ",").alias("topics_str")
    ).orderBy("doc_id")


# --- P2 PII redaction -------------------------------------------------------------

_P2_ORACLE = r"""
SELECT doc_id,
    substring(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(text,
                '\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b', '[EMAIL_REDACTED]', 'g'),
              '\b\d{3}-\d{3}-\d{4}\b', '[PHONE_REDACTED]', 'g'),
            '\b\(\d{3}\)\s*\d{3}-\d{4}\b', '[PHONE_REDACTED]', 'g'),
          '\b\d{4}[\s-]?\d{4}[\s-]?\d{4}[\s-]?\d{4}\b', '[CARD_REDACTED]', 'g'),
        '\b\d{3}-\d{2}-\d{4}\b', '[SSN_REDACTED]', 'g'),
      1, 200) AS redacted_preview
FROM documents
ORDER BY doc_id
"""


@register(
    "p2_pii_redaction",
    oracle=_P2_ORACLE,
    tags=("transform", "pii"),
    doc="P2 chained PII redaction + 200-char preview over documents.text "
    "(reference base_transformer.py:65-83).",
)
def p2_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.substring(redact_pii(F.col("text")), 1, 200).alias("redacted_preview")
    ).orderBy("doc_id")


# --- semi-structured projection (JSONB analog) -------------------------------------

_JSON_ORACLE = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events
ORDER BY event_id
"""


@register(
    "p_json_extract",
    oracle=_JSON_ORACLE,
    tags=("transform", "semistructured"),
    doc="JSONB-column projection analog: typed extraction from events.props "
    "(reference JSONB columns, sql/enhanced_schema.sql:28-131).",
)
def p_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    ).orderBy("event_id")


# --- scoring-family query over customer (P11/P25/P44 pattern) -----------------------

_SCORE_ORACLE = """
SELECT c_custkey,
    LEAST(
        (CASE WHEN c_acctbal > 5000 THEN 20 ELSE 5 END)
      + (CASE lower(c_mktsegment)
           WHEN 'building' THEN 25 WHEN 'automobile' THEN 20
           WHEN 'machinery' THEN 15 WHEN 'household' THEN 10
           WHEN 'furniture' THEN 5 ELSE 0 END)
      + (CASE WHEN c_name IS NOT NULL AND trim(c_name) <> '' THEN 10 ELSE 0 END)
      + (CASE WHEN c_acctbal < 0 THEN -15 ELSE 0 END),
    100) AS quality_score
FROM customer
ORDER BY c_custkey
"""

_SEGMENT_SCORES = {
    "building": 25,
    "automobile": 20,
    "machinery": 15,
    "household": 10,
    "furniture": 5,
}


@register(
    "p11_scoring_family",
    oracle=_SCORE_ORACLE,
    tags=("transform", "scoring"),
    doc="P11/P25/P44 additive-score pattern (map lookup + when-chain + "
    "cap/floor) applied to customer (reference marketo_transformer.py:143-193).",
)
def p11_scoring_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itertools import chain

    cust = load_table(spark, sf_dir, "customer")
    seg_map = F.create_map(
        *chain.from_iterable((F.lit(k), F.lit(v)) for k, v in _SEGMENT_SCORES.items())
    )
    score = (
        F.when(F.col("c_acctbal") > 5000, 20).otherwise(5)
        + F.coalesce(seg_map[F.lower(F.col("c_mktsegment"))], F.lit(0))
        + F.when(
            F.col("c_name").isNotNull() & (F.trim(F.col("c_name")) != ""), 10
        ).otherwise(0)
        + F.when(F.col("c_acctbal") < 0, -15).otherwise(0)
    )
    return cust.select(
        "c_custkey", F.least(score, F.lit(100)).alias("quality_score")
    ).orderBy("c_custkey")


# --- P40 quality metrics over documents -------------------------------------

_HELPFUL_SQL = " + ".join(
    f"CASE WHEN contains(tl, '{kw}') THEN 1 ELSE 0 END" for kw in ta.HELPFUL_INDICATORS
)

# completeness/relevance/helpfulness are integer-valued (5-point steps),
# so overall = round(sum/3, 1) is cross-engine safe: k/3 is never within
# 1/60 of a 1-decimal midpoint unless it IS an exact integer.
_P40_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         coalesce(text, '') AS tx,
         lower(coalesce(text, '')) AS tl,
         20 + (doc_id * 7) % 1980 AS tokens_out
  FROM documents
),
s AS (
  SELECT doc_id, tx, tokens_out,
    CASE WHEN length(tx) = 0 THEN 0.0 ELSE least(
      50.0 + CASE WHEN length(tx) > 100 THEN 20 ELSE 0 END
           + CASE WHEN length(tx) > 500 THEN 10 ELSE 0 END
           + CASE WHEN contains(tx, '.') THEN 10 ELSE 0 END
           + CASE WHEN contains(tx, chr(10)) THEN 5 ELSE 0 END
           + CASE WHEN contains(tl, 'however') OR contains(tl, 'additionally')
                       OR contains(tl, 'furthermore') THEN 5 ELSE 0 END,
      100.0) END AS completeness,
    CASE WHEN length(tx) = 0 THEN 0.0 ELSE least(
      70.0 - CASE WHEN contains(tl, 'sorry') AND contains(tl, 'help') THEN 20 ELSE 0 END
           + CASE WHEN contains(tl, 'specifically') OR contains(tl, 'exactly')
                       OR contains(tl, 'precisely') THEN 10 ELSE 0 END,
      100.0) END AS relevance,
    CASE WHEN length(tx) = 0 THEN 0.0 ELSE greatest(least(
      60.0 + least(({_HELPFUL_SQL}) * 5.0, 30.0)
           - CASE WHEN contains(tl, 'cannot') OR contains(tl, 'can''t') THEN 15 ELSE 0 END
           - CASE WHEN contains(tl, 'sorry') THEN 5 ELSE 0 END,
      100.0), 0.0) END AS helpfulness
  FROM t
)
SELECT doc_id, completeness, relevance, helpfulness,
  round((completeness + relevance + helpfulness) / 3.0, 1) AS overall,
  CASE WHEN length(tx) = 0 THEN 'empty'
       WHEN tokens_out < 10 THEN 'too_short'
       WHEN tokens_out > 1000 THEN 'very_long'
       WHEN tokens_out > 500 THEN 'long'
       WHEN tokens_out > 100 THEN 'appropriate'
       ELSE 'concise' END AS appropriateness
FROM s
"""


@register(
    "p40_quality_metrics",
    oracle=_P40_ORACLE,
    tags=("transform", "text_agent"),
    doc="P40 response-quality metrics over documents.text: completeness/"
    "relevance/helpfulness keyword scores, overall mean (round-1 safe: "
    "integer sums over 3 never graze a midpoint), appropriateness "
    "bucket from synthesized tokens_out (reference "
    "text_agent_transformer.py:325-426).",
)
def p40_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    tokens_out = (20 + (F.col("doc_id") * 7) % 1980).alias("tokens_out")
    return docs.select("doc_id", t.alias("text"), tokens_out).select(
        "doc_id",
        ta.completeness_score(F.col("text")).alias("completeness"),
        ta.relevance_score(F.col("text")).alias("relevance"),
        ta.helpfulness_score(F.col("text")).alias("helpfulness"),
        ta.overall_quality_score(F.col("text")).alias("overall"),
        ta.response_appropriateness(F.col("text"), F.col("tokens_out")).alias(
            "appropriateness"
        ),
    )
