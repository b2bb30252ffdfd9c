"""Agent-turn transforms (P29-P44).

Reference semantics: etl/transform/text_agent_transformer.py (cited per
function). All native column expressions; the keyword classifiers use
substring-containment / first-50-words semantics exactly as the
reference defines them.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.functions.common import (
    _col,
    contains_any,
    count_keyword_hits,
    normalize_string,
    redact_pii,
    standardize_timestamp_ms,
)

# --- model info (text_agent_transformer.py:86-136) -------------------------

MODEL_FAMILIES = ("gpt", "claude", "llama", "palm", "gemini")
SIZE_LARGE = ("large", "xl", "70b", "175b")
SIZE_MEDIUM = ("medium", "base", "13b", "30b")
SIZE_SMALL = ("small", "mini", "7b")

# --- content analysis keyword lists (text_agent_transformer.py:200-267) ----

ENGLISH_WORDS = ("the", "and", "is", "to", "in", "it", "you", "that", "he", "was")
SPANISH_WORDS = ("el", "la", "de", "que", "y", "es", "en", "un", "se", "no")
FRENCH_WORDS = ("le", "de", "et", "à", "un", "il", "être", "et", "en", "avoir")

# Extended language-mix lists (beyond the reference's en/es/fr parity
# set) — top-frequency stopwords per language, same vote mechanics.
GERMAN_WORDS = ("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich")
ITALIAN_WORDS = ("di", "che", "e", "il", "la", "per", "un", "in", "non", "sono")
PORTUGUESE_WORDS = ("de", "a", "o", "que", "e", "do", "da", "em", "um", "para")

# (ISO code, vocab) in tie-break priority order — first maximal wins.
LANGUAGE_VOCABS = (
    ("en", ENGLISH_WORDS),
    ("es", SPANISH_WORDS),
    ("fr", FRENCH_WORDS),
    ("de", GERMAN_WORDS),
    ("it", ITALIAN_WORDS),
    ("pt", PORTUGUESE_WORDS),
)

POSITIVE_WORDS = (
    "good", "great", "excellent", "amazing", "wonderful",
    "perfect", "love", "like", "happy", "pleased",
)
NEGATIVE_WORDS = (
    "bad", "terrible", "awful", "horrible", "hate",
    "dislike", "angry", "frustrated", "disappointed", "wrong",
)

TOPIC_KEYWORDS = {
    "product_info": ("product", "item", "specification", "feature", "price", "cost"),
    "support": ("help", "support", "issue", "problem", "trouble", "error"),
    "shipping": ("shipping", "delivery", "ship", "arrive", "tracking"),
    "payment": ("payment", "pay", "card", "billing", "charge", "refund"),
    "return": ("return", "exchange", "refund", "warranty", "guarantee"),
    "recommendation": ("recommend", "suggest", "best", "should", "consider"),
}

HELPFUL_INDICATORS = (
    "here", "steps", "how to", "you can", "try",
    "recommend", "suggest", "help", "solution", "answer",
)

CONVERSION_PATTERNS = {
    "purchase_intent": ("buy", "purchase", "order", "cart", "checkout"),
    "contact_request": ("contact", "call", "email", "speak", "talk"),
    "demo_request": ("demo", "trial", "preview", "show"),
    "information_request": ("more info", "details", "specifications", "pricing"),
}

# cost per 1k tokens (text_agent_transformer.py:453-458). Lookup key is
# extract_model_family's output, so only 'claude' ever hits a named entry —
# 'gpt-4'/'gpt-3.5' are unreachable (family is 'gpt'); preserved verbatim.
COST_PER_1K = {
    "gpt-4": (0.03, 0.06),
    "gpt-3.5": (0.001, 0.002),
    "claude": (0.008, 0.024),
    "default": (0.01, 0.02),
}

TOOL_CATEGORY_RULES = (
    (("search", "find", "lookup"), "search"),
    (("calc", "math", "compute"), "calculation"),
    (("data", "database", "query"), "data_access"),
    (("api", "service", "request"), "api_call"),
)


def model_family(model: Column | str) -> Column:
    """P29 (text_agent_transformer.py:86-101)."""
    m = F.lower(F.coalesce(_col(model), F.lit("")))
    expr = None
    for fam in MODEL_FAMILIES:
        cond = m.contains(fam)
        expr = F.when(cond, fam) if expr is None else expr.when(cond, fam)
    return expr.otherwise("other")


def model_size(model: Column | str) -> Column:
    """P30 (text_agent_transformer.py:103-114)."""
    m = F.lower(F.coalesce(_col(model), F.lit("")))
    return (
        F.when(contains_any(m, SIZE_LARGE), "large")
        .when(contains_any(m, SIZE_MEDIUM), "medium")
        .when(contains_any(m, SIZE_SMALL), "small")
        .otherwise("unknown")
    )


def model_capabilities(model: Column | str) -> Column:
    """P31: conditional tag array, default ['text_generation']
    (text_agent_transformer.py:116-130)."""
    m = F.lower(F.coalesce(_col(model), F.lit("")))
    tags = F.array_compact(
        F.array(
            F.when(m.contains("instruct") | m.contains("chat"), "instruction_following"),
            F.when(m.contains("code"), "code_generation"),
            F.when(m.contains("vision"), "vision"),
            F.when(m.contains("tool") | m.contains("function"), "tool_use"),
        )
    )
    return F.when(F.size(tags) == 0, F.array(F.lit("text_generation"))).otherwise(tags)


def model_version(model: Column | str) -> Column:
    """P32: first `v?\\d+(\\.\\d+)*` match, else NULL
    (text_agent_transformer.py:132-136)."""
    m = _col(model)
    v = F.regexp_extract(m, r"v?\d+(\.\d+)*", 0)
    return F.nullif(v, F.lit(""))


def tokens_per_second(tokens_out: Column | str, latency_ms: Column | str) -> Column:
    """P33 component (text_agent_transformer.py:146)."""
    out, lat = _col(tokens_out).cast("double"), _col(latency_ms).cast("double")
    return F.when(lat > 0, F.round(out / (lat / 1000.0), 2)).otherwise(F.lit(0.0))


def compression_ratio(tokens_out: Column | str, tokens_in: Column | str) -> Column:
    """P33 component (text_agent_transformer.py:147)."""
    out, inp = _col(tokens_out).cast("double"), _col(tokens_in).cast("double")
    return F.when(inp > 0, F.round(out / inp, 2)).otherwise(F.lit(0.0))


def efficiency_score(tokens_out: Column | str, latency_ms: Column | str) -> Column:
    """P34: tps buckets -> {100,80,60,40,20,10}; 0 when latency<=0
    (text_agent_transformer.py:159-179)."""
    out, lat = _col(tokens_out).cast("double"), _col(latency_ms).cast("double")
    tps = out / (lat / 1000.0)
    return (
        F.when(lat <= 0, 0)
        .when(tps > 50, 100)
        .when(tps > 25, 80)
        .when(tps > 10, 60)
        .when(tps > 5, 40)
        .when(tps > 1, 20)
        .otherwise(10)
    )


# --- content stats (P35, text_agent_transformer.py:181-198) -----------------

def word_count(text: Column | str) -> Column:
    """len(text.split()) — Python split() semantics: split on whitespace
    runs, ignoring leading/trailing."""
    t = F.coalesce(_col(text), F.lit(""))
    trimmed = F.trim(t)
    return F.when(F.length(trimmed) == 0, 0).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def sentence_count(text: Column | str) -> Column:
    """count('.') + count('!') + count('?')."""
    t = F.coalesce(_col(text), F.lit(""))
    def cnt(ch: str) -> Column:
        return F.length(t) - F.length(F.replace(t, F.lit(ch), F.lit("")))
    return (cnt(".") + cnt("!") + cnt("?")).cast("int")


def content_analysis(text: Column | str) -> Column:
    """P35-P38 struct (text_agent_transformer.py:181-198)."""
    t = F.coalesce(_col(text), F.lit(""))
    redacted = redact_pii(t)
    return F.struct(
        F.length(t).alias("response_length"),
        word_count(t).alias("word_count"),
        sentence_count(t).alias("sentence_count"),
        t.contains("```").alias("has_code_blocks"),
        t.contains("http").alias("has_links"),
        detect_language(t).alias("language"),
        sentiment(t).alias("sentiment"),
        topics(t).alias("topics"),
        F.when(F.length(redacted) > 0, F.substring(redacted, 1, 200)).alias(
            "redacted_preview"
        ),
    )


def _word_hits(words: Column, vocab: tuple[str, ...]) -> Column:
    """Count words (with multiplicity) that are in vocab."""
    lit_arr = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.filter(words, lambda w: F.array_contains(lit_arr, w)))


def detect_language(text: Column | str) -> Column:
    """P36: stopword votes over the first 50 whitespace tokens
    (text_agent_transformer.py:200-224). Ties: english >= others wins,
    then spanish > french, then french > 0."""
    t = F.coalesce(_col(text), F.lit(""))
    words = F.slice(F.split(F.trim(F.lower(t)), r"\s+"), 1, 50)
    eng = _word_hits(words, ENGLISH_WORDS)
    spa = _word_hits(words, SPANISH_WORDS)
    fra = _word_hits(words, FRENCH_WORDS)
    return (
        F.when(F.length(t) == 0, "unknown")
        .when((eng >= spa) & (eng >= fra), "english")
        .when(spa > fra, "spanish")
        .when(fra > 0, "french")
        .otherwise("unknown")
    )


def detect_language_ext(text: Column | str) -> Column:
    """Six-language stopword-vote language id (en/es/fr/de/it/pt).

    Extension of :func:`detect_language` (which stays exact-parity with
    the reference's en/es/fr rule): stopword hits over the first 50
    whitespace tokens per language, winner = max hit count, ties broken
    by :data:`LANGUAGE_VOCABS` priority order (first maximal wins),
    'unknown' for empty text or zero hits everywhere. Entirely
    row-local array expressions — language id runs at scan speed.
    """
    t = F.coalesce(_col(text), F.lit(""))
    words = F.slice(F.split(F.trim(F.lower(t)), r"\s+"), 1, 50)
    hits = [(code, _word_hits(words, vocab)) for code, vocab in LANGUAGE_VOCABS]
    best = F.greatest(*[h for _, h in hits])
    out = F.when(F.length(t) == 0, "unknown").when(best == 0, "unknown")
    for code, h in hits:
        out = out.when(h == best, code)
    return out.otherwise("unknown")


def sentiment(text: Column | str) -> Column:
    """P37: positive vs negative keyword-substring counts
    (text_agent_transformer.py:226-243)."""
    t = F.lower(F.coalesce(_col(text), F.lit("")))
    pos = count_keyword_hits(t, POSITIVE_WORDS)
    neg = count_keyword_hits(t, NEGATIVE_WORDS)
    return (
        F.when(F.length(t) == 0, "neutral")
        .when(pos > neg, "positive")
        .when(neg > pos, "negative")
        .otherwise("neutral")
    )


def topics(text: Column | str) -> Column:
    """P38: keyword-list topics, default ['general'] for non-empty text,
    [] for empty (text_agent_transformer.py:245-267)."""
    t = F.lower(F.coalesce(_col(text), F.lit("")))
    tags = F.array_compact(
        F.array(
            *[
                F.when(contains_any(t, kws), F.lit(topic))
                for topic, kws in TOPIC_KEYWORDS.items()
            ]
        )
    )
    return (
        F.when(F.length(t) == 0, F.array().cast("array<string>"))
        .when(F.size(tags) == 0, F.array(F.lit("general")))
        .otherwise(tags)
    )


# --- tool usage (P39, text_agent_transformer.py:279-323) --------------------

def tool_success_rate(tool_results: Column | str) -> Column:
    """Σ success / n over the tool_results map; empty/NULL -> 1.0.
    Missing 'success' field counts as success (dict.get default True)."""
    tr = _col(tool_results)
    vals = F.map_values(tr)
    n = F.size(vals)
    ok = F.size(F.filter(vals, lambda v: F.coalesce(v["success"], F.lit(True))))
    return F.when(tr.isNull() | (n == 0), F.lit(1.0)).otherwise(
        ok.cast("double") / n.cast("double")
    )


def tool_categories(tools_used: Column | str) -> Column:
    """Deduped tool categories (text_agent_transformer.py:302-323).

    Deviation note: the reference returns list(set(...)) — arbitrary
    Python set order; we return a sorted array for determinism.
    """
    tools = F.coalesce(_col(tools_used), F.array().cast("array<string>"))

    def categorize(tool: Column) -> Column:
        tl = F.lower(tool)
        expr = None
        for kws, cat in TOOL_CATEGORY_RULES:
            cond = contains_any(tl, kws)
            expr = F.when(cond, cat) if expr is None else expr.when(cond, cat)
        return expr.otherwise("other")

    return F.array_sort(F.array_distinct(F.transform(tools, categorize)))


# --- quality metrics (P40, text_agent_transformer.py:325-426) ----------------

def completeness_score(text: Column | str) -> Column:
    t = F.coalesce(_col(text), F.lit(""))
    score = (
        F.lit(50.0)
        + F.when(F.length(t) > 100, 20.0).otherwise(0.0)
        + F.when(F.length(t) > 500, 10.0).otherwise(0.0)
        + F.when(t.contains("."), 10.0).otherwise(0.0)
        + F.when(t.contains("\n"), 5.0).otherwise(0.0)
        + F.when(
            contains_any(F.lower(t), ("however", "additionally", "furthermore")), 5.0
        ).otherwise(0.0)
    )
    return F.when(F.length(t) == 0, 0.0).otherwise(F.least(score, F.lit(100.0)))


def relevance_score(text: Column | str) -> Column:
    t = F.lower(F.coalesce(_col(text), F.lit("")))
    score = (
        F.lit(70.0)
        - F.when(t.contains("sorry") & t.contains("help"), 20.0).otherwise(0.0)
        + F.when(contains_any(t, ("specifically", "exactly", "precisely")), 10.0).otherwise(0.0)
    )
    return F.when(F.length(t) == 0, 0.0).otherwise(F.least(score, F.lit(100.0)))


def helpfulness_score(text: Column | str) -> Column:
    t = F.lower(F.coalesce(_col(text), F.lit("")))
    hits = count_keyword_hits(t, HELPFUL_INDICATORS)
    score = (
        F.lit(60.0)
        + F.least(hits.cast("double") * 5, F.lit(30.0))
        - F.when(t.contains("cannot") | t.contains("can't"), 15.0).otherwise(0.0)
        - F.when(t.contains("sorry"), 5.0).otherwise(0.0)
    )
    return F.when(F.length(t) == 0, 0.0).otherwise(
        F.greatest(F.least(score, F.lit(100.0)), F.lit(0.0))
    )


def overall_quality_score(text: Column | str) -> Column:
    return F.round(
        (completeness_score(text) + relevance_score(text) + helpfulness_score(text)) / 3.0,
        1,
    )


def response_appropriateness(text: Column | str, tokens_out: Column | str) -> Column:
    """text_agent_transformer.py:412-426."""
    t = F.coalesce(_col(text), F.lit(""))
    out = _col(tokens_out).cast("long")
    return (
        F.when(F.length(t) == 0, "empty")
        .when(out < 10, "too_short")
        .when(out > 1000, "very_long")
        .when(out > 500, "long")
        .when(out > 100, "appropriate")
        .otherwise("concise")
    )


# --- business metrics (P41-P44, text_agent_transformer.py:428-528) -----------

def estimated_cost_usd(
    tokens_in: Column | str, tokens_out: Column | str, model: Column | str
) -> Column:
    """P41: per-1k-token rates by model family, round 6
    (text_agent_transformer.py:450-466)."""
    fam = model_family(model)
    in_rate_map = F.create_map(
        *chain.from_iterable((F.lit(k), F.lit(v[0])) for k, v in COST_PER_1K.items())
    )
    out_rate_map = F.create_map(
        *chain.from_iterable((F.lit(k), F.lit(v[1])) for k, v in COST_PER_1K.items())
    )
    in_rate = F.coalesce(in_rate_map[fam], F.lit(COST_PER_1K["default"][0]))
    out_rate = F.coalesce(out_rate_map[fam], F.lit(COST_PER_1K["default"][1]))
    inp, out = _col(tokens_in).cast("double"), _col(tokens_out).cast("double")
    return F.round(inp / 1000.0 * in_rate + out / 1000.0 * out_rate, 6)


def conversion_indicators(text: Column | str) -> Column:
    """P42: pattern-group tags, [] for empty (text_agent_transformer.py:468-487)."""
    t = F.lower(F.coalesce(_col(text), F.lit("")))
    tags = F.array_compact(
        F.array(
            *[
                F.when(contains_any(t, kws), F.lit(tag))
                for tag, kws in CONVERSION_PATTERNS.items()
            ]
        )
    )
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(tags)


def support_resolution(text: Column | str) -> Column:
    """P43 (text_agent_transformer.py:489-505)."""
    t = F.lower(F.coalesce(_col(text), F.lit("")))
    return (
        F.when(F.length(t) == 0, "unknown")
        .when(contains_any(t, ("solved", "fixed", "resolved", "working")), "resolved")
        .when(contains_any(t, ("try", "attempt", "check")), "troubleshooting")
        .when(contains_any(t, ("contact", "escalate", "specialist")), "escalation")
        .when(contains_any(t, ("sorry", "cannot", "unable")), "unresolved")
        .otherwise("informational")
    )


def business_value_score(text: Column | str, tokens_out: Column | str) -> Column:
    """P44: 50 +30(conversion) +10(out>100) +15('recommend') -10('sorry')
    -15(out<20); clamp [0,100] (text_agent_transformer.py:507-528)."""
    t = F.lower(F.coalesce(_col(text), F.lit("")))
    out = _col(tokens_out).cast("long")
    score = (
        F.lit(50)
        + F.when(F.size(conversion_indicators(t)) > 0, 30).otherwise(0)
        + F.when(out > 100, 10).otherwise(0)
        + F.when(t.contains("recommend"), 15).otherwise(0)
        - F.when(t.contains("sorry"), 10).otherwise(0)
        - F.when(out < 20, 15).otherwise(0)
    )
    return F.greatest(F.least(score, F.lit(100)), F.lit(0))


def transform_text_agent_turns(df: DataFrame) -> DataFrame:
    """P45 pipeline: raw agent turns -> analytic columns
    (text_agent_transformer.py:22-67)."""
    txt = F.col("response_text")
    return df.select(
        normalize_string("session_id").alias("session_id"),
        normalize_string("turn_id").alias("turn_id"),
        normalize_string("user_id").alias("user_id"),
        F.coalesce(normalize_string("channel"), F.lit("text")).alias("channel"),
        F.struct(
            F.col("model").alias("model_name"),
            model_family("model").alias("model_family"),
            model_size("model").alias("estimated_size"),
            model_capabilities("model").alias("capabilities"),
            model_version("model").alias("model_version"),
        ).alias("model_info"),
        F.struct(
            F.col("tokens_in").cast("int").alias("tokens_in"),
            F.col("tokens_out").cast("int").alias("tokens_out"),
            (F.col("tokens_in") + F.col("tokens_out")).cast("int").alias("total_tokens"),
            F.col("latency_ms").cast("double").alias("latency_ms"),
            tokens_per_second("tokens_out", "latency_ms").alias("tokens_per_second"),
            compression_ratio("tokens_out", "tokens_in").alias("compression_ratio"),
            efficiency_score("tokens_out", "latency_ms").alias("efficiency_score"),
        ).alias("performance_metrics"),
        content_analysis(txt).alias("content_analysis"),
        standardize_timestamp_ms("timestamp").alias("timestamp"),
        F.struct(
            F.coalesce(F.size("tools_used"), F.lit(0)).alias("tools_count"),
            F.coalesce(F.col("tools_used"), F.array().cast("array<string>")).alias(
                "tools_used"
            ),
            tool_success_rate("tool_results").alias("tool_success_rate"),
            tool_categories("tools_used").alias("tool_categories"),
        ).alias("tool_usage"),
        F.struct(
            completeness_score(txt).alias("completeness_score"),
            relevance_score(txt).alias("relevance_score"),
            helpfulness_score(txt).alias("helpfulness_score"),
            overall_quality_score(txt).alias("overall_quality_score"),
            response_appropriateness(txt, "tokens_out").alias("response_appropriateness"),
        ).alias("quality_metrics"),
        F.struct(
            estimated_cost_usd("tokens_in", "tokens_out", "model").alias(
                "estimated_cost_usd"
            ),
            conversion_indicators(txt).alias("conversion_indicators"),
            support_resolution(txt).alias("support_resolution_type"),
            business_value_score(txt, "tokens_out").alias("business_value_score"),
        ).alias("business_metrics"),
    )
