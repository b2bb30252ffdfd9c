"""Frontend event transforms (P17-P28).

Reference semantics: etl/transform/frontend_transformer.py (cited per
function). All native column expressions — URL work uses parse_url /
str_to_map, classifier chains are when() cascades in the reference's
declaration order (first match wins).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.functions.common import (
    _col,
    contains_any,
    normalize_string,
    redact_pii,
    standardize_timestamp_ms,
)

# reference frontend_transformer.py:80-95 — mapping is identity over its
# keys and passthrough otherwise, so normalize == lower + '-'->'_'
def normalize_event_type(event_type: Column | str) -> Column:
    """P17 (frontend_transformer.py:74-98); empty/NULL -> 'unknown'."""
    e = _col(event_type)
    return F.when(
        e.isNull() | (F.length(e) == 0), F.lit("unknown")
    ).otherwise(F.regexp_replace(F.lower(e), "-", "_"))


# reference frontend_transformer.py:152-169 — ordered keyword rules
PAGE_CATEGORY_RULES = (
    (("/product", "/p/"), "product"),
    (("/category", "/c/", "/collection"), "category"),
    (("/cart", "/checkout"), "checkout"),
    (("/about", "/company"), "about"),
    (("/contact", "/support"), "contact"),
    (("/blog", "/news", "/article"), "content"),
    (("/search", "/results"), "search"),
    (("/account", "/profile", "/dashboard"), "account"),
)

SEARCH_ENGINES = (
    "google.com", "bing.com", "yahoo.com", "duckduckgo.com",
    "baidu.com", "yandex.com", "ask.com",
)
SOCIAL_PLATFORMS = (
    "facebook.com", "twitter.com", "linkedin.com", "instagram.com",
    "pinterest.com", "youtube.com", "tiktok.com", "snapchat.com",
    "reddit.com", "tumblr.com",
)
EMAIL_PLATFORMS = ("gmail.com", "outlook.com", "yahoo.com", "mail.google.com", "webmail", "mail.")

MOBILE_INDICATORS = ("mobile", "iphone", "ipod", "android")
TABLET_INDICATORS = ("tablet", "ipad")
IS_MOBILE_INDICATORS = ("mobile", "iphone", "ipod", "android", "blackberry", "windows phone")

# reference frontend_transformer.py:377-385
EVENT_ENGAGEMENT_SCORES = {
    "purchase": 100,
    "form_submit": 80,
    "widget_open": 60,
    "message_sent": 70,
    "click": 20,
    "scroll": 10,
    "page_view": 15,
}


def categorize_page(path: Column | str) -> Column:
    """P19: URL path -> 9 categories (frontend_transformer.py:144-169)."""
    p = F.lower(_col(path))
    expr = F.when(p.isNull() | (F.length(p) == 0) | (p == "/"), "homepage")
    for keywords, category in PAGE_CATEGORY_RULES:
        expr = expr.when(contains_any(p, keywords), category)
    return expr.otherwise("other")


def categorize_referrer(domain: Column | str) -> Column:
    """P20: referrer domain -> channel (frontend_transformer.py:202-233).

    Substring containment in the reference's list order — note yahoo.com
    is in both the search and email lists; search wins (order preserved).
    """
    d = F.lower(_col(domain))
    return (
        F.when(d.isNull() | (F.length(d) == 0), "direct")
        .when(contains_any(d, SEARCH_ENGINES), "search")
        .when(contains_any(d, SOCIAL_PLATFORMS), "social")
        .when(contains_any(d, EMAIL_PLATFORMS), "email")
        .otherwise("referral")
    )


def parse_page_info(page_url: Column | str, page_title: Column | str) -> Column:
    """P18: urlparse -> struct (frontend_transformer.py:100-142).

    Spark-native via parse_url. Deviation: 'domain' is parse_url HOST
    (no port), while Python's urlparse netloc keeps ':port' — identical
    for portless URLs.
    """
    url = _col(page_url)
    host = F.parse_url(url, F.lit("HOST"))
    path = F.parse_url(url, F.lit("PATH"))
    query = F.parse_url(url, F.lit("QUERY"))
    # first-value flatten of query params: str_to_map keeps the LAST dup,
    # python parse_qs [0] keeps the first — identical when keys are unique
    params = F.str_to_map(F.coalesce(query, F.lit("")), F.lit("&"), F.lit("="))
    empty = url.isNull() | (F.length(url) == 0)
    return F.struct(
        F.when(~empty, url).alias("url"),
        F.when(~empty, host).alias("domain"),
        F.when(~empty, path).alias("path"),
        F.when(~empty, params).otherwise(F.create_map().cast("map<string,string>")).alias(
            "query_params"
        ),
        normalize_string(page_title).alias("title"),
        F.when(empty, "unknown").otherwise(categorize_page(path)).alias("category"),
        F.when(~empty, params["utm_source"]).alias("utm_source"),
        F.when(~empty, params["utm_medium"]).alias("utm_medium"),
        F.when(~empty, params["utm_campaign"]).alias("utm_campaign"),
    )


def parse_referrer_info(referrer: Column | str) -> Column:
    """P20 struct: {referrer, referrer_domain, referrer_type}
    (frontend_transformer.py:171-200)."""
    r = _col(referrer)
    empty = r.isNull() | (F.length(r) == 0)
    domain = F.lower(F.parse_url(r, F.lit("HOST")))
    return F.struct(
        F.when(~empty, r).alias("referrer"),
        F.when(~empty, domain).alias("referrer_domain"),
        F.when(empty, "direct").otherwise(categorize_referrer(domain)).alias("referrer_type"),
    )


def device_type(user_agent: Column | str) -> Column:
    """P21 (frontend_transformer.py:249-261)."""
    ua = F.lower(_col(user_agent))
    return (
        F.when(ua.isNull() | (F.length(ua) == 0), "unknown")
        .when(contains_any(ua, MOBILE_INDICATORS), "mobile")
        .when(contains_any(ua, TABLET_INDICATORS), "tablet")
        .otherwise("desktop")
    )


def browser(user_agent: Column | str) -> Column:
    """P21 (frontend_transformer.py:263-281)."""
    ua = F.lower(_col(user_agent))
    return (
        F.when(ua.isNull() | (F.length(ua) == 0), "unknown")
        .when(ua.contains("chrome") & ~ua.contains("edg"), "chrome")
        .when(ua.contains("firefox"), "firefox")
        .when(ua.contains("safari") & ~ua.contains("chrome"), "safari")
        .when(ua.contains("edg"), "edge")
        .when(ua.contains("opera"), "opera")
        .otherwise("other")
    )


def operating_system(user_agent: Column | str) -> Column:
    """P21 (frontend_transformer.py:283-301)."""
    ua = F.lower(_col(user_agent))
    return (
        F.when(ua.isNull() | (F.length(ua) == 0), "unknown")
        .when(ua.contains("windows"), "windows")
        .when(ua.contains("mac os") | ua.contains("macos"), "macos")
        .when(ua.contains("linux"), "linux")
        .when(ua.contains("android"), "android")
        .when(ua.contains("ios") | ua.contains("iphone") | ua.contains("ipad"), "ios")
        .otherwise("other")
    )


def is_mobile(user_agent: Column | str) -> Column:
    """P21 (frontend_transformer.py:303-309)."""
    ua = F.lower(_col(user_agent))
    return F.when(ua.isNull(), F.lit(False)).otherwise(
        contains_any(ua, IS_MOBILE_INDICATORS)
    )


def user_segment(page_url: Column | str, event_type: Column | str, referrer: Column | str) -> Column:
    """P24: rule-based segment (frontend_transformer.py:353-369)."""
    url = F.lower(F.coalesce(_col(page_url), F.lit("")))
    et = F.coalesce(_col(event_type), F.lit(""))
    ref = F.coalesce(_col(referrer), F.lit(""))
    return (
        F.when(url.contains("checkout") | (et == "purchase"), "buyer")
        .when(et.isin("widget_open", "message_sent"), "engaged")
        .when(url.contains("product"), "browser")
        .when(F.length(ref) == 0, "direct")
        .otherwise("visitor")
    )


def engagement_score(event_type: Column | str, time_on_page: Column | str) -> Column:
    """P25: base-by-type + time bonus, cap 100 (frontend_transformer.py:371-398)."""
    et = F.coalesce(_col(event_type), F.lit(""))
    m = F.create_map(
        *chain.from_iterable((F.lit(k), F.lit(v)) for k, v in EVENT_ENGAGEMENT_SCORES.items())
    )
    base = F.coalesce(m[et], F.lit(5))
    top = F.coalesce(_col(time_on_page).cast("long"), F.lit(0))
    bonus = (
        F.when(top > 300, 20).when(top > 120, 10).when(top > 30, 5).otherwise(0)
    )
    return F.least(base + bonus, F.lit(100))


def conversion_stage(event_type: Column | str, page_url: Column | str) -> Column:
    """P26: funnel stage rules (frontend_transformer.py:400-414)."""
    et = F.coalesce(_col(event_type), F.lit(""))
    url = F.lower(F.coalesce(_col(page_url), F.lit("")))
    return (
        F.when((et == "purchase") | url.contains("thank-you"), "conversion")
        .when(url.contains("checkout") | url.contains("cart"), "purchase_intent")
        .when((et == "widget_open") | url.contains("contact"), "consideration")
        .when(url.contains("product"), "interest")
        .otherwise("awareness")
    )


def event_quality_score(
    session_id: Column | str,
    user_agent: Column | str,
    page_url: Column | str,
    timestamp: Column | str,
) -> Column:
    """P27: 100 - 10*missing important field - 50 if bot UA; floor 0
    (frontend_transformer.py:416-430). 'Missing' follows Python
    truthiness: NULL, empty string, or numeric 0."""
    def missing(c: Column | str, numeric: bool = False) -> Column:
        col = _col(c)
        pred = col.isNull() | (F.trim(col.cast("string")) == "")
        if numeric:
            pred = pred | (col.cast("string").try_cast("double") == 0)
        return F.when(pred, 10).otherwise(0)

    deductions = (
        missing(session_id)
        + missing(user_agent)
        + missing(page_url)
        + missing(timestamp, numeric=True)
    )
    bot = F.when(
        F.lower(F.coalesce(_col(user_agent), F.lit(""))).contains("bot"), 50
    ).otherwise(0)
    return F.greatest(F.lit(100) - deductions - bot, F.lit(0))


def transform_frontend_events(df: DataFrame) -> DataFrame:
    """P45 pipeline: raw frontend events -> analytic columns
    (frontend_transformer.py:23-72)."""
    et = normalize_event_type("event_type")
    return df.select(
        normalize_string("session_id").alias("session_id"),
        normalize_string("user_id").alias("user_id"),
        et.alias("event_type"),
        normalize_string("interaction_type").alias("interaction_type"),
        normalize_string("widget_id").alias("widget_id"),
        parse_page_info("page_url", "page_title").alias("page_info"),
        parse_referrer_info("referrer").alias("referrer_info"),
        F.struct(
            F.col("user_agent").alias("user_agent"),
            device_type("user_agent").alias("device_type"),
            browser("user_agent").alias("browser"),
            operating_system("user_agent").alias("operating_system"),
            is_mobile("user_agent").alias("is_mobile"),
            F.col("screen_resolution").alias("screen_resolution"),
            F.col("viewport_size").alias("viewport_size"),
        ).alias("device_info"),
        standardize_timestamp_ms("timestamp").alias("timestamp"),
        F.struct(
            F.col("load_time_ms"),
            F.col("time_on_page"),
            F.col("time_since_last_event"),
            F.col("session_duration"),
        ).alias("timing_info"),
        user_segment("page_url", "event_type", "referrer").alias("user_segment"),
        engagement_score(et, "time_on_page").alias("engagement_score"),
        conversion_stage(et, "page_url").alias("conversion_stage"),
        event_quality_score("session_id", "user_agent", "page_url", "timestamp").alias(
            "quality_score"
        ),
        F.struct(
            F.col("country"),
            F.col("region"),
            F.col("city"),
            F.col("timezone"),
            F.when(
                F.col("ip_address").isNotNull(), redact_pii(F.col("ip_address"))
            ).alias("ip_address"),
        ).alias("geographic_info"),
    )


# --- URL canonicalization (web-corpus curation extension) --------------------------

# Tracking params dropped during canonicalization (the industry-standard
# strip list; utm_* covers source/medium/campaign/term/content).
# Case-insensitive: hand-built campaign links carry UTM_SOURCE= etc.
TRACKING_PARAM_RE = r"(?i)^(utm_[a-z]+|gclid|fbclid|msclkid|mc_eid)="

# '\\' terminates the authority too: WHATWG parsers treat a backslash as
# '/' in special-scheme URLs, so 'https://evil.com\\@innocent.com/x'
# resolves host evil.com in a browser — a host regex that runs to the
# last '@' would key it as innocent.com and make the blocklist evadable.
_URL_HOST_RE = r"^[a-zA-Z]+://([^/?#\\]+)"
_URL_PATH_RE = r"^[a-zA-Z]+://[^/?#\\]+([^?#]*)"
# query = text between the first '?' BEFORE any '#' and the fragment; a
# bare '\?([^#]*)' would match a '?' inside the fragment and resurrect
# fragment content as a query string
_URL_QUERY_RE = r"^[^#]*?\?([^#]*)"


def canonical_url(url: Column | str) -> Column:
    """Canonical form of a URL for corpus-level dedup/grouping.

    Rules (each a deliberate many-to-one collapse): force https, lowercase
    host, strip a leading ``www.``, drop default ports, strip the
    fragment, drop tracking query params, sort surviving params
    lexicographically, and strip one trailing ``/`` from the path.

    Parsing is regexp-based (not ``parse_url``) so the exact same
    expressions run in any ANSI engine — the DuckDB oracle uses these
    regexes verbatim. Entirely row-local whole-stage-codegen; at 100 TB
    this canonicalization runs at scan speed ahead of the URL-dedup
    shuffle, which then keys on the (shorter) canonical string.
    Null/scheme-less input canonicalizes to NULL.
    """
    u = _col(url)
    host = url_domain(u)
    path = F.regexp_replace(F.regexp_extract(u, _URL_PATH_RE, 1), r"/+$", "")
    query = F.regexp_extract(u, _URL_QUERY_RE, 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (F.length(p) > 0) & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(kept, "&")
    return F.when(
        host != "",
        F.concat(
            F.lit("https://"),
            host,
            path,
            F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
        ),
    )


def url_domain(url: Column | str) -> Column:
    """Canonical host of a URL (lowercase, no userinfo, no ``www.``
    prefix, no default port) — the blocklist / per-site-rollup key. Same
    regex family as :func:`canonical_url`; '' when the input has no
    scheme. Userinfo strips FIRST: the authority regex captures
    ``user:pass@host`` whole, and a blocklist keyed on the bare domain
    must not be evadable by prefixing credentials. The strip is greedy
    to the LAST ``@`` — WHATWG/urllib split authority there, so
    ``a@b@host`` must resolve to ``host``, not ``b@host``."""
    host_port = F.regexp_extract(_col(url), _URL_HOST_RE, 1)
    no_user = F.regexp_replace(F.lower(host_port), r"^.*@", "")
    return F.regexp_replace(
        F.regexp_replace(no_user, r":(443|80)$", ""), r"^www\.", ""
    )
