"""Generic transforms shared by all sources (P1-P5).

Reference semantics: etl/transform/base_transformer.py (cited per
function). All are pure column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MS_CUTOFF = 1_000_000_000_000  # reference base_transformer.py:51: >1e12 => already ms


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def standardize_timestamp_ms(ts: Column | str) -> Column:
    """P1: heterogeneous timestamp -> epoch milliseconds.

    Reference base_transformer.py:43-63: numeric > 1e12 is already ms;
    numeric <= 1e12 is seconds (*1000); strings are ISO-8601 with a 'Z'
    -> '+00:00' fixup. Deliberate deviation (SURVEY §7 hard-part 4): on
    unparseable input the reference returns now() — non-deterministic —
    we return NULL so bad rows are quarantine-able.
    """
    c = _col(ts)
    # try_cast/try_to_timestamp: ANSI-mode-safe (bad input -> NULL, not error)
    as_num = c.cast("string").try_cast("double")
    iso = F.try_to_timestamp(F.regexp_replace(c.cast("string"), "Z$", "+00:00"))
    return (
        F.when(c.isNull(), F.lit(None).cast("long"))
        .when(as_num.isNotNull() & (as_num > MS_CUTOFF), as_num.cast("long"))
        .when(as_num.isNotNull(), (as_num * 1000).cast("long"))
        .otherwise(F.unix_millis(iso))
    )


# P2: redaction patterns applied IN ORDER (base_transformer.py:65-83).
# The quirky TLD class [A-Z|a-z]{2,} (includes '|') is the reference's
# exact pattern, preserved for parity. Phone dd d-ddd-dddd runs BEFORE
# the SSN pattern, so '123-456-7890' redacts as PHONE not SSN.
PII_PATTERNS = (
    (r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b", "[EMAIL_REDACTED]"),
    (r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE_REDACTED]"),
    (r"\b\(\d{3}\)\s*\d{3}-\d{4}\b", "[PHONE_REDACTED]"),
    (r"\b\d{4}[\s-]?\d{4}[\s-]?\d{4}[\s-]?\d{4}\b", "[CARD_REDACTED]"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN_REDACTED]"),
)


def redact_pii(text: Column | str) -> Column:
    """P2: chained regexp_replace over emails/phones/cards/SSNs."""
    out = _col(text)
    for pattern, replacement in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, replacement)
    return out


def normalize_string(value: Column | str) -> Column:
    """P3: cast->string, trim, empty->NULL (base_transformer.py:85-95)."""
    return F.nullif(F.trim(_col(value).cast("string")), F.lit(""))


def generate_event_id() -> Column:
    """P4: uuid4 (base_transformer.py:97-99)."""
    return F.uuid()


def deterministic_event_id(*cols: Column | str) -> Column:
    """P4 variant for reproducible tests: content-addressed id."""
    return F.sha2(F.concat_ws("\x1f", *[_col(c).cast("string") for c in cols]), 256)


def envelope(
    event_type: Column | str,
    source: Column | str,
    data: Column,
    event_id: Column | None = None,
    ts_ms: Column | None = None,
    transformer: str = "engine",
    version: str = "1.0.0",
) -> Column:
    """P5: standardized event envelope (base_transformer.py:109-124).

    {event_id, event_type, source, ts_ms, data, metadata.transformation}
    ``event_type``/``source`` may be literals (str) or per-row columns.
    """
    et = F.lit(event_type) if isinstance(event_type, str) else event_type
    src = F.lit(source) if isinstance(source, str) else source
    return F.struct(
        (event_id if event_id is not None else generate_event_id()).alias("event_id"),
        et.alias("event_type"),
        src.alias("source"),
        (ts_ms if ts_ms is not None else F.unix_millis(F.current_timestamp())).alias("ts_ms"),
        data.alias("data"),
        F.struct(
            F.struct(
                F.lit(transformer).alias("transformer"),
                F.lit(version).alias("version"),
                F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ssXXX").alias(
                    "applied_at"
                ),
            ).alias("transformation")
        ).alias("metadata"),
    )


def required_fields_ok(*cols: Column | str) -> Column:
    """F1: all required fields present & non-null (base_transformer.py:34-41)."""
    pred = F.lit(True)
    for c in cols:
        pred = pred & _col(c).isNotNull()
    return pred


def contains_any(text: Column, keywords: tuple[str, ...]) -> Column:
    """True if any keyword appears as a substring (the reference's
    pervasive ``any(k in text for k in ...)`` idiom). NULL-safe: NULL -> false."""
    t = F.coalesce(text, F.lit(""))
    pred = F.lit(False)
    for kw in keywords:
        pred = pred | t.contains(kw)
    return pred


def count_keyword_hits(text: Column, keywords: tuple[str, ...]) -> Column:
    """Number of DISTINCT keywords appearing as substrings (reference's
    ``sum(1 for w in words if w in text)`` idiom — each keyword counts once)."""
    t = F.coalesce(text, F.lit(""))
    return sum(
        (F.when(t.contains(kw), 1).otherwise(0) for kw in keywords), start=F.lit(0)
    )
