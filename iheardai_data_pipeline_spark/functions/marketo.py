"""Marketo lead + activity transforms (P6-P16).

Reference semantics: etl/transform/marketo_transformer.py (cited per
function). All native column expressions.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.functions.common import (
    _col,
    normalize_string,
    standardize_timestamp_ms,
)

EMAIL_PATTERN = r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$"

# reference marketo_transformer.py:106-117
LEAD_SOURCE_MAP = {
    "web": "Website",
    "website": "Website",
    "organic search": "Organic Search",
    "paid search": "Paid Search",
    "social media": "Social Media",
    "email": "Email Marketing",
    "webinar": "Webinar",
    "trade show": "Trade Show",
    "referral": "Referral",
    "direct mail": "Direct Mail",
}

# reference marketo_transformer.py:153 — named "business_domains" but is
# actually the freemail list (non-members score higher)
FREEMAIL_DOMAINS = ("gmail.com", "yahoo.com", "hotmail.com", "outlook.com")

# reference marketo_transformer.py:167-176
LEAD_SOURCE_SCORES = {
    "referral": 25,
    "webinar": 20,
    "trade show": 20,
    "organic search": 15,
    "website": 15,
    "paid search": 10,
    "social media": 10,
    "email": 5,
}

COMPLETENESS_FIELDS = ("firstName", "lastName", "company", "title", "phone")

# reference marketo_transformer.py:245-263
ACTIVITY_TYPE_NAMES = {
    1: "Visit Webpage",
    2: "Fill Out Form",
    3: "Click Link",
    6: "Send Email",
    7: "Email Delivered",
    8: "Email Bounced",
    9: "Unsubscribe Email",
    10: "Open Email",
    11: "Click Email",
    12: "New Lead",
    13: "Change Data Value",
    22: "Interesting Moment",
    24: "Request Campaign",
    25: "Send Alert",
    104: "Download Content",
    110: "Visit Booth",
    113: "Attend Event",
}

# reference marketo_transformer.py:283-295
ACTIVITY_ENGAGEMENT_SCORES = {
    2: 50,
    104: 40,
    22: 35,
    110: 30,
    113: 30,
    10: 20,
    11: 25,
    3: 15,
    1: 10,
    6: 5,
    7: 5,
}

# reference marketo_transformer.py:301-310
ACTIVITY_CATEGORIES = {
    "email": (6, 7, 8, 9, 10, 11),
    "web": (1, 3),
    "form": (2,),
    "content": (104,),
    "event": (110, 113),
    "campaign": (24, 25),
    "data": (12, 13),
    "engagement": (22,),
}


def _map_literal(d: dict) -> Column:
    return F.create_map(*chain.from_iterable((F.lit(k), F.lit(v)) for k, v in d.items()))


def normalize_email(email: Column | str) -> Column:
    """P6: trim+lower, regex-validate else NULL (marketo_transformer.py:64-78)."""
    e = F.lower(F.trim(_col(email)))
    return F.when(e.rlike(EMAIL_PATTERN), e)


def normalize_phone(phone: Column | str) -> Column:
    """P7: US phone formatting (marketo_transformer.py:80-98).

    10 digits -> (XXX) XXX-XXXX; 11 starting with 1 -> 1-(XXX) XXX-XXXX;
    otherwise the trimmed original (international passthrough).
    """
    p = _col(phone)
    digits = F.regexp_replace(p, r"\D", "")
    fmt10 = F.format_string(
        "(%s) %s-%s",
        F.substring(digits, 1, 3),
        F.substring(digits, 4, 3),
        F.substring(digits, 7, 4),
    )
    fmt11 = F.format_string(
        "1-(%s) %s-%s",
        F.substring(digits, 2, 3),
        F.substring(digits, 5, 3),
        F.substring(digits, 8, 4),
    )
    return (
        F.when(p.isNull() | (F.length(p) == 0), F.lit(None).cast("string"))
        .when(F.length(digits) == 10, fmt10)
        .when((F.length(digits) == 11) & digits.startswith("1"), fmt11)
        .otherwise(F.trim(p))
    )


def normalize_lead_source(lead_source: Column | str) -> Column:
    """P8: canonical source map, else initcap (marketo_transformer.py:100-120).

    Deviation note: the Python fallback is str.title() which capitalizes
    after any non-letter; Spark initcap splits on whitespace only. Equal
    for all whitespace-separated inputs.
    """
    src = _col(lead_source)
    key = F.lower(F.trim(src))
    return F.when(
        src.isNull() | (F.length(src) == 0), F.lit(None).cast("string")
    ).otherwise(F.coalesce(_map_literal(LEAD_SOURCE_MAP)[key], F.initcap(src)))


def create_full_name(first: Column | str, last: Column | str) -> Column:
    """P9: 'first last' with null-coalescing (marketo_transformer.py:122-134)."""
    f, l = normalize_string(first), normalize_string(last)
    return F.nullif(F.concat_ws(" ", f, l), F.lit(""))


def extract_email_domain(email: Column | str) -> Column:
    """P10: substring after '@', lowered (marketo_transformer.py:136-141)."""
    e = _col(email)
    return F.when(e.contains("@"), F.lower(F.substring_index(e, "@", -1)))


def lead_quality_score(
    email: Column | str,
    first: Column | str,
    last: Column | str,
    company: Column | str,
    title: Column | str,
    phone: Column | str,
    lead_source: Column | str,
    updated_at: Column | str,
    as_of_ms: Column | None = None,
) -> Column:
    """P11: additive 0-100 lead score (marketo_transformer.py:143-193).

    +20 non-freemail domain else +5; +10 per present field of 5; source
    score map; recency bonus vs ``as_of_ms`` (+10 <=1 day, +5 <=7 days).
    Deviation: the reference compares updatedAt against wall-clock now();
    we take an explicit ``as_of_ms`` anchor for determinism (pass the
    batch max or a fixed instant).
    """
    e = _col(email)
    domain = extract_email_domain(e)
    email_score = (
        F.when(domain.isNull(), 0)
        .when(domain.isin(*FREEMAIL_DOMAINS), 5)
        .otherwise(20)
    )
    # reference truthiness: present = non-null AND non-empty string
    completeness = sum(
        (
            F.when(F.nullif(F.trim(_col(c).cast("string")), F.lit("")).isNotNull(), 10).otherwise(0)
            for c in (first, last, company, title, phone)
        ),
        start=F.lit(0),
    )
    src_key = F.lower(F.coalesce(_col(lead_source).cast("string"), F.lit("")))
    source_score = F.coalesce(_map_literal(LEAD_SOURCE_SCORES)[src_key], F.lit(0))
    upd_ms = standardize_timestamp_ms(updated_at)
    days_since = ((as_of_ms if as_of_ms is not None else F.unix_millis(F.current_timestamp())) - upd_ms) / F.lit(86_400_000.0)
    recency = (
        F.when(upd_ms.isNull(), 0)
        .when(days_since.cast("int") <= 1, 10)  # reference uses whole .days
        .when(days_since.cast("int") <= 7, 5)
        .otherwise(0)
    )
    return F.least(email_score + completeness + source_score + recency, F.lit(100))


def geographic_info(
    country: Column | str,
    state: Column | str,
    city: Column | str,
    postal_code: Column | str,
    timezone: Column | str,
) -> Column:
    """P12: normalized geo struct (marketo_transformer.py:195-203)."""
    return F.struct(
        normalize_string(country).alias("country"),
        normalize_string(state).alias("state"),
        normalize_string(city).alias("city"),
        normalize_string(postal_code).alias("postal_code"),
        normalize_string(timezone).alias("timezone"),
    )


def activity_type_name(activity_type_id: Column | str) -> Column:
    """P13: 17-entry id->name map, default 'Unknown Activity (id)'
    (marketo_transformer.py:243-265)."""
    tid = _col(activity_type_id)
    m = F.create_map(
        *chain.from_iterable((F.lit(k), F.lit(v)) for k, v in ACTIVITY_TYPE_NAMES.items())
    )
    return F.coalesce(m[tid], F.format_string("Unknown Activity (%d)", tid.cast("long")))


def activity_attributes_map(attributes: Column | str) -> Column:
    """P14: list[{name,value}] -> map with lower/underscore keys
    (marketo_transformer.py:267-276)."""
    attrs = _col(attributes)
    entries = F.transform(
        F.filter(attrs, lambda a: a["name"].isNotNull() & a["value"].isNotNull()),
        lambda a: F.struct(
            F.regexp_replace(F.lower(a["name"]), " ", "_").alias("key"),
            F.nullif(F.trim(a["value"].cast("string")), F.lit("")).alias("value"),
        ),
    )
    return F.map_from_entries(entries)


def activity_engagement_score(activity_type_id: Column | str) -> Column:
    """P15: id->score map, default 5 (marketo_transformer.py:278-297)."""
    m = F.create_map(
        *chain.from_iterable(
            (F.lit(k), F.lit(v)) for k, v in ACTIVITY_ENGAGEMENT_SCORES.items()
        )
    )
    return F.coalesce(m[_col(activity_type_id)], F.lit(5))


def activity_category(activity_type_id: Column | str) -> Column:
    """P16: 8-category reverse lookup, default 'other'
    (marketo_transformer.py:299-315)."""
    tid = _col(activity_type_id)
    expr = F.lit("other")
    # build when-chain in declaration order (first match wins, as in the dict scan)
    chain_expr = None
    for cat, ids in ACTIVITY_CATEGORIES.items():
        cond = tid.isin(*ids)
        chain_expr = F.when(cond, cat) if chain_expr is None else chain_expr.when(cond, cat)
    return chain_expr.otherwise(expr)


def transform_marketo_leads(df: DataFrame, as_of_ms: Column | None = None) -> DataFrame:
    """P45 pipeline: raw Marketo lead records -> analytic columns.

    DataFrame-native restatement of MarketoTransformer.transform
    (marketo_transformer.py:21-62). Invalid rows (missing id/email) are
    NOT dropped here — use ``operators.validation.split_required`` for
    the quarantine split (F1).
    """
    return df.select(
        F.col("id").cast("long").alias("lead_id"),
        normalize_email("email").alias("email"),
        normalize_string("firstName").alias("first_name"),
        normalize_string("lastName").alias("last_name"),
        normalize_string("company").alias("company"),
        normalize_string("title").alias("title"),
        normalize_phone("phone").alias("phone"),
        normalize_lead_source("leadSource").alias("lead_source"),
        normalize_string("originalSourceType").alias("original_source_type"),
        normalize_string("leadStatus").alias("lead_status"),
        standardize_timestamp_ms("createdAt").alias("created_at"),
        standardize_timestamp_ms("updatedAt").alias("updated_at"),
        create_full_name("firstName", "lastName").alias("full_name"),
        extract_email_domain(normalize_email("email")).alias("email_domain"),
        lead_quality_score(
            "email", "firstName", "lastName", "company", "title", "phone",
            "leadSource", "updatedAt", as_of_ms=as_of_ms,
        ).alias("lead_quality_score"),
        geographic_info("country", "state", "city", "postalCode", "timezone").alias(
            "geographic_info"
        ),
    )


def transform_marketo_activities(df: DataFrame) -> DataFrame:
    """P45 pipeline: raw activity records -> analytic columns
    (marketo_transformer.py:211-237)."""
    return df.select(
        F.col("id").cast("long").alias("activity_id"),
        F.col("leadId").cast("long").alias("lead_id"),
        F.col("activityTypeId").cast("int").alias("activity_type_id"),
        activity_type_name("activityTypeId").alias("activity_type"),
        standardize_timestamp_ms("activityDate").alias("activity_date"),
        normalize_string("primaryAttributeValue").alias("primary_attribute_value"),
        activity_attributes_map("attributes").alias("attributes"),
        activity_engagement_score("activityTypeId").alias("engagement_score"),
        activity_category("activityTypeId").alias("activity_category"),
    )
