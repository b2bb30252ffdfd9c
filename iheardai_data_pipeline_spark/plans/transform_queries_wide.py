"""Wide transform-layer coverage: catalog queries for the P-families not
already exercised by transform_queries.py, each with a DuckDB oracle.

The driver tables are narrow (TPC-H-ish), so contact/URL/UA/model inputs
are SYNTHESIZED deterministically from integer keys — with the identical
expression on the Spark side and in the oracle SQL — then pushed through
the real transform functions. This checks the transform semantics
themselves (the synthesis is shared scaffolding on both sides).

Covered here:
- P6-P10  contact normalization (email/phone/full-name) ... customer
- P13-P16 Marketo activity enrichment ................... orders
- P17-P21 URL / referrer / device classification ........ events
- P24-P27 segment / engagement / stage / quality ........ events
- P29-P34 + P41 model metrics + cost .................... events
- P42-P44 business signals .............................. documents
- F1/F2   validation + quarantine split ................. events
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.functions import frontend as fe
from iheardai_data_pipeline_spark.functions import marketo as mk
from iheardai_data_pipeline_spark.functions import text_agent as ta
from iheardai_data_pipeline_spark.operators import validation as val
from iheardai_data_pipeline_spark.plans.catalog import register
from iheardai_data_pipeline_spark.sources.batch import load_table

# --- P6-P10 contact normalization over customer -----------------------------------

_CONTACT_ORACLE = r"""
WITH synth AS (
  SELECT c_custkey,
    CASE c_custkey % 4
      WHEN 0 THEN '  Customer' || c_custkey || '@Gmail.COM  '
      WHEN 1 THEN 'user.' || c_custkey || '@Acme-Corp.com'
      WHEN 2 THEN 'not-an-email-' || c_custkey
      ELSE 'USER_' || c_custkey || '@Yahoo.com' END AS raw_email,
    CASE c_custkey % 4
      WHEN 0 THEN printf('%03d.%03d.%04d',
                         CAST(200 + c_custkey % 700 AS INT),
                         CAST(100 + c_custkey % 900 AS INT),
                         CAST(1000 + c_custkey % 9000 AS INT))
      WHEN 1 THEN printf('1 (%03d) %03d-%04d',
                         CAST(200 + c_custkey % 700 AS INT),
                         CAST(100 + c_custkey % 900 AS INT),
                         CAST(1000 + c_custkey % 9000 AS INT))
      WHEN 2 THEN printf('+44 20 7%03d %04d',
                         CAST(c_custkey % 1000 AS INT),
                         CAST(c_custkey % 10000 AS INT))
      ELSE '' END AS raw_phone,
    CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE lower(c_mktsegment) END AS first_raw,
    'Cust' || c_custkey AS last_raw
  FROM customer
),
norm AS (
  SELECT c_custkey, raw_phone, first_raw, last_raw,
    CASE WHEN regexp_matches(lower(trim(raw_email)),
              '^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$')
         THEN lower(trim(raw_email)) END AS email_norm
  FROM synth
)
SELECT c_custkey,
  email_norm,
  CASE WHEN email_norm LIKE '%@%'
       THEN lower(regexp_extract(email_norm, '@(.*)$', 1)) END AS email_domain,
  CASE WHEN raw_phone = '' THEN NULL
       WHEN length(regexp_replace(raw_phone, '\D', '', 'g')) = 10
       THEN printf('(%s) %s-%s',
                   substr(regexp_replace(raw_phone, '\D', '', 'g'), 1, 3),
                   substr(regexp_replace(raw_phone, '\D', '', 'g'), 4, 3),
                   substr(regexp_replace(raw_phone, '\D', '', 'g'), 7, 4))
       WHEN length(regexp_replace(raw_phone, '\D', '', 'g')) = 11
            AND regexp_replace(raw_phone, '\D', '', 'g') LIKE '1%'
       THEN printf('1-(%s) %s-%s',
                   substr(regexp_replace(raw_phone, '\D', '', 'g'), 2, 3),
                   substr(regexp_replace(raw_phone, '\D', '', 'g'), 5, 3),
                   substr(regexp_replace(raw_phone, '\D', '', 'g'), 8, 4))
       ELSE trim(raw_phone) END AS phone_norm,
  nullif(concat_ws(' ',
                   nullif(trim(first_raw), ''),
                   nullif(trim(last_raw), '')), '') AS full_name
FROM norm
"""


@register(
    "p6_p10_contact_normalize",
    oracle=_CONTACT_ORACLE,
    tags=("transform", "marketo"),
    doc="P6-P10 email/phone/full-name normalization on synthesized contact "
    "fields (reference marketo_transformer.py:64-141).",
)
def p6_p10_contact_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    raw_email = (
        F.when(k % 4 == 0, F.concat(F.lit("  Customer"), k, F.lit("@Gmail.COM  ")))
        .when(k % 4 == 1, F.concat(F.lit("user."), k, F.lit("@Acme-Corp.com")))
        .when(k % 4 == 2, F.concat(F.lit("not-an-email-"), k))
        .otherwise(F.concat(F.lit("USER_"), k, F.lit("@Yahoo.com")))
    )
    a = (200 + k % 700).cast("int")
    b = (100 + k % 900).cast("int")
    c = (1000 + k % 9000).cast("int")
    raw_phone = (
        F.when(k % 4 == 0, F.format_string("%03d.%03d.%04d", a, b, c))
        .when(k % 4 == 1, F.format_string("1 (%03d) %03d-%04d", a, b, c))
        .when(
            k % 4 == 2,
            F.format_string(
                "+44 20 7%03d %04d", (k % 1000).cast("int"), (k % 10000).cast("int")
            ),
        )
        .otherwise(F.lit(""))
    )
    first_raw = F.when(k % 5 == 0, F.lit(None).cast("string")).otherwise(
        F.lower(F.col("c_mktsegment"))
    )
    last_raw = F.concat(F.lit("Cust"), k)
    email_norm = mk.normalize_email(raw_email)
    return cust.select(
        "c_custkey",
        email_norm.alias("email_norm"),
        mk.extract_email_domain(email_norm).alias("email_domain"),
        mk.normalize_phone(raw_phone).alias("phone_norm"),
        mk.create_full_name(first_raw, last_raw).alias("full_name"),
    )


# --- P13-P16 activity enrichment over orders ---------------------------------------

def _case_from_map(expr: str, mapping: dict, default_sql: str) -> str:
    whens = " ".join(f"WHEN {k} THEN '{v}'" for k, v in mapping.items())
    return f"CASE {expr} {whens} ELSE {default_sql} END"


_ACTIVITY_ORACLE = f"""
WITH synth AS (SELECT o_orderkey, o_orderkey % 30 AS tid FROM orders)
SELECT o_orderkey, tid,
  {_case_from_map("tid", mk.ACTIVITY_TYPE_NAMES, "printf('Unknown Activity (%d)', tid)")} AS activity_name,
  {_case_from_map("tid", mk.ACTIVITY_ENGAGEMENT_SCORES, "5")} AS engagement,
  CASE WHEN tid IN (6, 7, 8, 9, 10, 11) THEN 'email'
       WHEN tid IN (1, 3) THEN 'web'
       WHEN tid IN (2) THEN 'form'
       WHEN tid IN (104) THEN 'content'
       WHEN tid IN (110, 113) THEN 'event'
       WHEN tid IN (24, 25) THEN 'campaign'
       WHEN tid IN (12, 13) THEN 'data'
       WHEN tid IN (22) THEN 'engagement'
       ELSE 'other' END AS category
FROM synth
"""


@register(
    "p13_p16_activity_enrich",
    oracle=_ACTIVITY_ORACLE,
    tags=("transform", "marketo"),
    doc="P13/P15/P16 activity id -> name/score/category maps over synthetic "
    "ids (reference marketo_transformer.py:243-315).",
)
def p13_p16_activity_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    tid = (F.col("o_orderkey") % 30).alias("tid")
    df = orders.select("o_orderkey", tid)
    return df.select(
        "o_orderkey",
        "tid",
        mk.activity_type_name(F.col("tid")).alias("activity_name"),
        mk.activity_engagement_score(F.col("tid")).alias("engagement"),
        mk.activity_category(F.col("tid")).alias("category"),
    )


# --- shared URL/referrer/UA synthesis over events ----------------------------------

_URL_SQL = """CASE event_id % 5
  WHEN 0 THEN 'https://shop.example.com/product/' || event_id || '?utm_source=google&utm_medium=cpc&q=shoes'
  WHEN 1 THEN 'https://shop.example.com/checkout/cart?utm_campaign=summer_sale'
  WHEN 2 THEN 'http://blog.example.com/article/how-to-' || event_id
  WHEN 3 THEN 'https://www.example.com/'
  ELSE 'https://example.com/search?q=widgets&page=2' END"""

_REF_SQL = """CASE user_id % 5
  WHEN 0 THEN 'https://www.google.com/search?q=shoes'
  WHEN 1 THEN 'https://m.facebook.com/story'
  WHEN 2 THEN 'https://webmail.example.org/inbox'
  WHEN 3 THEN 'https://partner.example.org/deals'
  ELSE '' END"""

_UA_SQL = """CASE WHEN event_id % 7 = 0 THEN NULL ELSE CASE user_id % 6
  WHEN 0 THEN 'Mozilla/5.0 (iPhone; CPU iPhone OS 15_0 like Mac OS X) AppleWebKit/605.1.15 Version/15.0 Mobile/15E148 Safari/604.1'
  WHEN 1 THEN 'Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 Chrome/120.0.0.0 Safari/537.36'
  WHEN 2 THEN 'Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 Version/17.0 Safari/605.1.15'
  WHEN 3 THEN 'Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0'
  WHEN 4 THEN 'Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 Chrome/120.0 Mobile Safari/537.36'
  ELSE 'Googlebot/2.1 (+http://www.google.com/bot.html)' END END"""


def _synth_url() -> F.Column:
    eid = F.col("event_id")
    return (
        F.when(
            eid % 5 == 0,
            F.concat(
                F.lit("https://shop.example.com/product/"),
                eid,
                F.lit("?utm_source=google&utm_medium=cpc&q=shoes"),
            ),
        )
        .when(eid % 5 == 1, F.lit("https://shop.example.com/checkout/cart?utm_campaign=summer_sale"))
        .when(eid % 5 == 2, F.concat(F.lit("http://blog.example.com/article/how-to-"), eid))
        .when(eid % 5 == 3, F.lit("https://www.example.com/"))
        .otherwise(F.lit("https://example.com/search?q=widgets&page=2"))
    )


def _synth_ref() -> F.Column:
    uid = F.col("user_id")
    return (
        F.when(uid % 5 == 0, F.lit("https://www.google.com/search?q=shoes"))
        .when(uid % 5 == 1, F.lit("https://m.facebook.com/story"))
        .when(uid % 5 == 2, F.lit("https://webmail.example.org/inbox"))
        .when(uid % 5 == 3, F.lit("https://partner.example.org/deals"))
        .otherwise(F.lit(""))
    )


def _synth_ua() -> F.Column:
    uid, eid = F.col("user_id"), F.col("event_id")
    ua = (
        F.when(
            uid % 6 == 0,
            F.lit(
                "Mozilla/5.0 (iPhone; CPU iPhone OS 15_0 like Mac OS X) AppleWebKit/605.1.15 Version/15.0 Mobile/15E148 Safari/604.1"
            ),
        )
        .when(
            uid % 6 == 1,
            F.lit(
                "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 Chrome/120.0.0.0 Safari/537.36"
            ),
        )
        .when(
            uid % 6 == 2,
            F.lit(
                "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 Version/17.0 Safari/605.1.15"
            ),
        )
        .when(
            uid % 6 == 3,
            F.lit("Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0"),
        )
        .when(
            uid % 6 == 4,
            F.lit(
                "Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 Chrome/120.0 Mobile Safari/537.36"
            ),
        )
        .otherwise(F.lit("Googlebot/2.1 (+http://www.google.com/bot.html)"))
    )
    return F.when(eid % 7 == 0, F.lit(None).cast("string")).otherwise(ua)


# --- P17-P21 URL / referrer / device classification --------------------------------

_FRONTEND_URLS_ORACLE = f"""
WITH synth AS (
  SELECT event_id, {_URL_SQL} AS url, {_REF_SQL} AS ref, {_UA_SQL} AS ua
  FROM events
),
parsed AS (
  SELECT event_id, url, ref, ua,
    regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS url_domain,
    regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS url_path,
    lower(regexp_extract(ref, '^[a-z]+://([^/?#]+)', 1)) AS ref_domain,
    lower(coalesce(ua, '')) AS lua
  FROM synth
)
SELECT event_id, url_domain, url_path,
  nullif(regexp_extract(url, '[?&]utm_source=([^&#]+)', 1), '') AS utm_source,
  CASE WHEN url_path = '/' OR url_path = '' THEN 'homepage'
       WHEN contains(url_path, '/product') OR contains(url_path, '/p/') THEN 'product'
       WHEN contains(url_path, '/category') OR contains(url_path, '/c/')
            OR contains(url_path, '/collection') THEN 'category'
       WHEN contains(url_path, '/cart') OR contains(url_path, '/checkout') THEN 'checkout'
       WHEN contains(url_path, '/about') OR contains(url_path, '/company') THEN 'about'
       WHEN contains(url_path, '/contact') OR contains(url_path, '/support') THEN 'contact'
       WHEN contains(url_path, '/blog') OR contains(url_path, '/news')
            OR contains(url_path, '/article') THEN 'content'
       WHEN contains(url_path, '/search') OR contains(url_path, '/results') THEN 'search'
       WHEN contains(url_path, '/account') OR contains(url_path, '/profile')
            OR contains(url_path, '/dashboard') THEN 'account'
       ELSE 'other' END AS page_category,
  CASE WHEN ref = '' THEN NULL ELSE ref_domain END AS referrer_domain,
  CASE WHEN ref = '' THEN 'direct'
       WHEN contains(ref_domain, 'google.com') OR contains(ref_domain, 'bing.com')
            OR contains(ref_domain, 'yahoo.com') OR contains(ref_domain, 'duckduckgo.com')
            OR contains(ref_domain, 'baidu.com') OR contains(ref_domain, 'yandex.com')
            OR contains(ref_domain, 'ask.com') THEN 'search'
       WHEN contains(ref_domain, 'facebook.com') OR contains(ref_domain, 'twitter.com')
            OR contains(ref_domain, 'linkedin.com') OR contains(ref_domain, 'instagram.com')
            OR contains(ref_domain, 'pinterest.com') OR contains(ref_domain, 'youtube.com')
            OR contains(ref_domain, 'tiktok.com') OR contains(ref_domain, 'snapchat.com')
            OR contains(ref_domain, 'reddit.com') OR contains(ref_domain, 'tumblr.com')
            THEN 'social'
       WHEN contains(ref_domain, 'gmail.com') OR contains(ref_domain, 'outlook.com')
            OR contains(ref_domain, 'yahoo.com') OR contains(ref_domain, 'mail.google.com')
            OR contains(ref_domain, 'webmail') OR contains(ref_domain, 'mail.')
            THEN 'email'
       ELSE 'referral' END AS referrer_type,
  CASE WHEN ua IS NULL OR lua = '' THEN 'unknown'
       WHEN contains(lua, 'mobile') OR contains(lua, 'iphone') OR contains(lua, 'ipod')
            OR contains(lua, 'android') THEN 'mobile'
       WHEN contains(lua, 'tablet') OR contains(lua, 'ipad') THEN 'tablet'
       ELSE 'desktop' END AS device,
  CASE WHEN ua IS NULL OR lua = '' THEN 'unknown'
       WHEN contains(lua, 'chrome') AND NOT contains(lua, 'edg') THEN 'chrome'
       WHEN contains(lua, 'firefox') THEN 'firefox'
       WHEN contains(lua, 'safari') AND NOT contains(lua, 'chrome') THEN 'safari'
       WHEN contains(lua, 'edg') THEN 'edge'
       WHEN contains(lua, 'opera') THEN 'opera'
       ELSE 'other' END AS browser_name,
  CASE WHEN ua IS NULL OR lua = '' THEN 'unknown'
       WHEN contains(lua, 'windows') THEN 'windows'
       WHEN contains(lua, 'mac os') OR contains(lua, 'macos') THEN 'macos'
       WHEN contains(lua, 'linux') THEN 'linux'
       WHEN contains(lua, 'android') THEN 'android'
       WHEN contains(lua, 'ios') OR contains(lua, 'iphone') OR contains(lua, 'ipad') THEN 'ios'
       ELSE 'other' END AS os_name,
  CASE WHEN ua IS NULL THEN FALSE
       ELSE contains(lua, 'mobile') OR contains(lua, 'iphone') OR contains(lua, 'ipod')
            OR contains(lua, 'android') OR contains(lua, 'blackberry')
            OR contains(lua, 'windows phone') END AS mobile
FROM parsed
"""


@register(
    "p17_p21_frontend_urls",
    oracle=_FRONTEND_URLS_ORACLE,
    tags=("transform", "frontend"),
    doc="P17-P21 URL parse + page/referrer categorization + UA device "
    "classification on synthesized web fields (reference "
    "frontend_transformer.py:100-309).",
)
def p17_p21_frontend_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism, eval_once

    # fan out the single-split scan (this is the heaviest regex chain in
    # the catalog) and pin the synthesized url/ref/ua behind a generator
    # barrier: the outer select references each one from 4+ parse
    # expressions, and CollapseProject would otherwise inline the synth
    # CASE into every reference
    events = ensure_parallelism(load_table(spark, sf_dir, "events"))
    df = eval_once(
        events.select("event_id", "user_id"),
        url=_synth_url(),
        ref=_synth_ref(),
        ua=_synth_ua(),
    ).drop("user_id")
    pi = fe.parse_page_info(F.col("url"), F.lit(None).cast("string"))
    ri = fe.parse_referrer_info(F.col("ref"))
    return df.select(
        "event_id",
        pi["domain"].alias("url_domain"),
        pi["path"].alias("url_path"),
        pi["utm_source"].alias("utm_source"),
        pi["category"].alias("page_category"),
        ri["referrer_domain"].alias("referrer_domain"),
        ri["referrer_type"].alias("referrer_type"),
        fe.device_type(F.col("ua")).alias("device"),
        fe.browser(F.col("ua")).alias("browser_name"),
        fe.operating_system(F.col("ua")).alias("os_name"),
        fe.is_mobile(F.col("ua")).alias("mobile"),
    )


# --- P24-P27 segment / engagement / stage / quality --------------------------------

_ENGAGE_CASE = """CASE event_type
  WHEN 'purchase' THEN 100 WHEN 'form_submit' THEN 80 WHEN 'widget_open' THEN 60
  WHEN 'message_sent' THEN 70 WHEN 'click' THEN 20 WHEN 'scroll' THEN 10
  WHEN 'page_view' THEN 15 ELSE 5 END"""

_EVENT_SCORES_ORACLE = f"""
WITH synth AS (
  SELECT event_id, user_id, event_type,
         {_URL_SQL} AS url, {_REF_SQL} AS ref, {_UA_SQL} AS ua,
         CAST(floor(value) AS BIGINT) AS top
  FROM events
)
SELECT event_id,
  CASE WHEN contains(lower(url), 'checkout') OR event_type = 'purchase' THEN 'buyer'
       WHEN event_type IN ('widget_open', 'message_sent') THEN 'engaged'
       WHEN contains(lower(url), 'product') THEN 'browser'
       WHEN ref = '' THEN 'direct'
       ELSE 'visitor' END AS segment,
  least({_ENGAGE_CASE}
        + CASE WHEN top > 300 THEN 20 WHEN top > 120 THEN 10
               WHEN top > 30 THEN 5 ELSE 0 END, 100) AS engagement,
  CASE WHEN event_type = 'purchase' OR contains(lower(url), 'thank-you') THEN 'conversion'
       WHEN contains(lower(url), 'checkout') OR contains(lower(url), 'cart') THEN 'purchase_intent'
       WHEN event_type = 'widget_open' OR contains(lower(url), 'contact') THEN 'consideration'
       WHEN contains(lower(url), 'product') THEN 'interest'
       ELSE 'awareness' END AS stage,
  greatest(100
    - (CASE WHEN ua IS NULL THEN 10 ELSE 0 END)
    - (CASE WHEN event_id = 0 THEN 10 ELSE 0 END)
    - (CASE WHEN ua IS NOT NULL AND contains(lower(ua), 'bot') THEN 50 ELSE 0 END),
    0) AS quality
FROM synth
"""


@register(
    "p24_p27_event_scores",
    oracle=_EVENT_SCORES_ORACLE,
    tags=("transform", "frontend", "scoring"),
    doc="P24-P27 user segment, engagement score, conversion stage, event "
    "quality (bot penalty + missing-field deductions) over events "
    "(reference frontend_transformer.py:353-430).",
)
def p24_p27_event_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism, eval_once

    # same treatment as p17_p21: fan out, then pin the synthesized
    # url/ref/ua once — the scoring expressions below reference each
    # several times
    events = ensure_parallelism(load_table(spark, sf_dir, "events"))
    df = eval_once(
        events.select("event_id", "user_id", "event_type", "value"),
        url=_synth_url(),
        ref=_synth_ref(),
        ua=_synth_ua(),
    ).select(
        "event_id",
        "event_type",
        "url",
        "ref",
        "ua",
        F.floor(F.col("value")).cast("long").alias("top"),
        F.concat(F.lit("sess-"), F.col("user_id")).alias("session_id"),
        F.col("event_id").alias("ts_num"),
    )
    return df.select(
        "event_id",
        fe.user_segment(F.col("url"), F.col("event_type"), F.col("ref")).alias("segment"),
        fe.engagement_score(F.col("event_type"), F.col("top")).alias("engagement"),
        fe.conversion_stage(F.col("event_type"), F.col("url")).alias("stage"),
        fe.event_quality_score(
            F.col("session_id"), F.col("ua"), F.col("url"), F.col("ts_num")
        ).alias("quality"),
    )


# --- P29-P34 + P41 model metrics ---------------------------------------------------

_MODEL_SQL = """CASE event_id % 6
  WHEN 0 THEN 'gpt-4-turbo'
  WHEN 1 THEN 'claude-3-opus-20240229'
  WHEN 2 THEN 'llama-2-70b-chat'
  WHEN 3 THEN 'gemini-1.5-pro'
  WHEN 4 THEN 'palm-2-small'
  ELSE 'mixtral-8x7b-instruct-v0.1' END"""

_MODEL_METRICS_ORACLE = f"""
WITH synth AS (
  SELECT event_id,
    {_MODEL_SQL} AS model,
    50 + event_id % 950 AS tokens_in,
    20 + (event_id * 7) % 1980 AS tokens_out,
    1 + (event_id * 13) % 5000 AS latency_ms
  FROM events
),
fam AS (
  SELECT *, lower(model) AS lm,
    CASE WHEN contains(lower(model), 'gpt') THEN 'gpt'
         WHEN contains(lower(model), 'claude') THEN 'claude'
         WHEN contains(lower(model), 'llama') THEN 'llama'
         WHEN contains(lower(model), 'palm') THEN 'palm'
         WHEN contains(lower(model), 'gemini') THEN 'gemini'
         ELSE 'other' END AS family
  FROM synth
)
SELECT event_id, family,
  CASE WHEN contains(lm, 'large') OR contains(lm, 'xl') OR contains(lm, '70b')
            OR contains(lm, '175b') THEN 'large'
       WHEN contains(lm, 'medium') OR contains(lm, 'base') OR contains(lm, '13b')
            OR contains(lm, '30b') THEN 'medium'
       WHEN contains(lm, 'small') OR contains(lm, 'mini') OR contains(lm, '7b') THEN 'small'
       ELSE 'unknown' END AS size_class,
  nullif(regexp_extract(model, 'v?\\d+(\\.\\d+)*', 0), '') AS version,
  tokens_in + tokens_out AS total_tokens,
  CAST(floor(tokens_out / (latency_ms / 1000.0) * 100 + 0.5) AS BIGINT) AS tps_x100,
  CAST(floor(CAST(tokens_out AS DOUBLE) / tokens_in * 100 + 0.5) AS BIGINT) AS comp_x100,
  CASE WHEN latency_ms <= 0 THEN 0
       WHEN tokens_out / (latency_ms / 1000.0) > 50 THEN 100
       WHEN tokens_out / (latency_ms / 1000.0) > 25 THEN 80
       WHEN tokens_out / (latency_ms / 1000.0) > 10 THEN 60
       WHEN tokens_out / (latency_ms / 1000.0) > 5 THEN 40
       WHEN tokens_out / (latency_ms / 1000.0) > 1 THEN 20
       ELSE 10 END AS efficiency,
  round(tokens_in / 1000.0 * (CASE WHEN family = 'claude' THEN 0.008 ELSE 0.01 END)
      + tokens_out / 1000.0 * (CASE WHEN family = 'claude' THEN 0.024 ELSE 0.02 END),
      6) AS cost_usd
FROM fam
"""


@register(
    "p29_p34_model_metrics",
    oracle=_MODEL_METRICS_ORACLE,
    tags=("transform", "text_agent"),
    doc="P29-P34 model family/size/version + perf metrics + P41 cost over "
    "synthesized model/token fields (reference "
    "text_agent_transformer.py:86-179,450-466).",
)
def p29_p34_model_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    model = (
        F.when(eid % 6 == 0, F.lit("gpt-4-turbo"))
        .when(eid % 6 == 1, F.lit("claude-3-opus-20240229"))
        .when(eid % 6 == 2, F.lit("llama-2-70b-chat"))
        .when(eid % 6 == 3, F.lit("gemini-1.5-pro"))
        .when(eid % 6 == 4, F.lit("palm-2-small"))
        .otherwise(F.lit("mixtral-8x7b-instruct-v0.1"))
    )
    df = events.select(
        "event_id",
        model.alias("model"),
        (50 + eid % 950).alias("tokens_in"),
        (20 + (eid * 7) % 1980).alias("tokens_out"),
        (1 + (eid * 13) % 5000).alias("latency_ms"),
    )
    return df.select(
        "event_id",
        ta.model_family(F.col("model")).alias("family"),
        ta.model_size(F.col("model")).alias("size_class"),
        ta.model_version(F.col("model")).alias("version"),
        (F.col("tokens_in") + F.col("tokens_out")).alias("total_tokens"),
        # scaled-int variants of P33's round-2 metrics: Spark round() (HALF_UP
        # on the shortest decimal string) and DuckDB round() (binary value)
        # disagree at exact .xx5 midpoints, so the hash-compared columns use
        # floor(x*100+0.5) — identical double ops in both engines. The round-2
        # originals (ta.tokens_per_second/compression_ratio) are unit-tested.
        F.floor(
            F.col("tokens_out") / (F.col("latency_ms") / F.lit(1000.0)) * 100 + F.lit(0.5)
        )
        .cast("long")
        .alias("tps_x100"),
        F.floor(
            F.col("tokens_out").cast("double") / F.col("tokens_in") * 100 + F.lit(0.5)
        )
        .cast("long")
        .alias("comp_x100"),
        ta.efficiency_score(F.col("tokens_out"), F.col("latency_ms")).alias("efficiency"),
        ta.estimated_cost_usd(
            F.col("tokens_in"), F.col("tokens_out"), F.col("model")
        ).alias("cost_usd"),
    )


# --- P42-P44 business signals over documents ---------------------------------------

def _contains_any_sql(expr: str, kws: tuple[str, ...]) -> str:
    return "(" + " OR ".join(f"contains({expr}, '{w}')" for w in kws) + ")"


_BUSINESS_ORACLE = f"""
WITH synth AS (
  SELECT doc_id, lower(text) AS lt, n_chars % 150 AS tokens_out FROM documents
),
ind AS (
  SELECT doc_id, lt, tokens_out,
    list_filter([
      CASE WHEN {_contains_any_sql("lt", ta.CONVERSION_PATTERNS["purchase_intent"])} THEN 'purchase_intent' END,
      CASE WHEN {_contains_any_sql("lt", ta.CONVERSION_PATTERNS["contact_request"])} THEN 'contact_request' END,
      CASE WHEN {_contains_any_sql("lt", ta.CONVERSION_PATTERNS["demo_request"])} THEN 'demo_request' END,
      CASE WHEN {_contains_any_sql("lt", ta.CONVERSION_PATTERNS["information_request"])} THEN 'information_request' END
    ], x -> x IS NOT NULL) AS tags
  FROM synth
)
SELECT doc_id,
  coalesce(array_to_string(tags, ','), '') AS indicators,
  CASE WHEN length(lt) = 0 THEN 'unknown'
       WHEN {_contains_any_sql("lt", ("solved", "fixed", "resolved", "working"))} THEN 'resolved'
       WHEN {_contains_any_sql("lt", ("try", "attempt", "check"))} THEN 'troubleshooting'
       WHEN {_contains_any_sql("lt", ("contact", "escalate", "specialist"))} THEN 'escalation'
       WHEN {_contains_any_sql("lt", ("sorry", "cannot", "unable"))} THEN 'unresolved'
       ELSE 'informational' END AS resolution,
  greatest(least(50
    + CASE WHEN len(tags) > 0 THEN 30 ELSE 0 END
    + CASE WHEN tokens_out > 100 THEN 10 ELSE 0 END
    + CASE WHEN contains(lt, 'recommend') THEN 15 ELSE 0 END
    - CASE WHEN contains(lt, 'sorry') THEN 10 ELSE 0 END
    - CASE WHEN tokens_out < 20 THEN 15 ELSE 0 END, 100), 0) AS business_value
FROM ind
"""


@register(
    "p42_p44_business_signals",
    oracle=_BUSINESS_ORACLE,
    tags=("transform", "text_agent", "scoring"),
    doc="P42-P44 conversion indicators, support resolution, business value "
    "score over documents.text (reference text_agent_transformer.py:468-528).",
)
def p42_p44_business_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    df = docs.select(
        "doc_id",
        F.col("text"),
        (F.col("n_chars") % 150).alias("tokens_out"),
    )
    return df.select(
        "doc_id",
        F.array_join(ta.conversion_indicators(F.col("text")), ",").alias("indicators"),
        ta.support_resolution(F.col("text")).alias("resolution"),
        ta.business_value_score(F.col("text"), F.col("tokens_out")).alias("business_value"),
    )


# --- F1/F2 validation + quarantine split -------------------------------------------

_VALID_TYPES = ("click", "view", "purchase", "signup")

_VALID_IN = ", ".join(f"'{t}'" for t in _VALID_TYPES)

_VALIDATION_ORACLE = f"""
SELECT CASE WHEN event_type IN ({_VALID_IN}) AND user_id IS NOT NULL
            AND ts IS NOT NULL
       THEN 'valid' ELSE 'quarantine' END AS status,
       count(*) AS n
FROM events
GROUP BY 1
"""


@register(
    "f1_f2_validation_split",
    oracle=_VALIDATION_ORACLE,
    tags=("validation",),
    doc="F1/F2 required-field + enum-domain validation with quarantine "
    "split; both branches are lazy filters over one scan (reference "
    "base_transformer.py:34-41, frontend_events_extractor.py:48-57).",
)
def f1_f2_validation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    pred = val.required_fields_predicate(events, ("user_id", "ts")) & val.enum_predicate(
        "event_type", _VALID_TYPES
    )
    valid, quarantine = val.split_valid(events, pred)
    return valid.select(F.lit("valid").alias("status")).union(
        quarantine.select(F.lit("quarantine").alias("status"))
    ).groupBy("status").agg(F.count(F.lit(1)).alias("n"))


# --- P39/A9 tool usage over synthesized nested collections -------------------------

# tools/success bits derive from event_id so the oracle can compute the
# expected aggregate arithmetically without reproducing Spark's map/array
# machinery: n_tools = event_id%4, tool i succeeded iff bit i of event_id.
_TOOL_USAGE_ORACLE = """
WITH synth AS (
  SELECT event_id,
    event_id % 4 AS n_tools,
    (event_id // 1) % 2 AS b0, (event_id // 2) % 2 AS b1, (event_id // 4) % 2 AS b2
  FROM events
)
SELECT event_id,
  n_tools AS tools_count,
  CASE WHEN n_tools = 0 THEN 1.0
       WHEN n_tools = 1 THEN b0 * 1.0 / 1
       WHEN n_tools = 2 THEN (b0 + b1) * 1.0 / 2
       ELSE (b0 + b1 + b2) * 1.0 / 3 END AS success_rate,
  CASE n_tools
    WHEN 0 THEN ''
    WHEN 1 THEN 'search'
    WHEN 2 THEN 'calculation,search'
    ELSE 'calculation,data_access,search' END AS categories_str
FROM synth
"""


@register(
    "p39_a9_tool_usage",
    oracle=_TOOL_USAGE_ORACLE,
    tags=("transform", "text_agent", "nested"),
    doc="P39/A9 tool usage: success rate aggregated over a map<string,"
    "struct> column and keyword-categorized tool names from an array "
    "column (reference text_agent_transformer.py:279-323).",
)
def p39_a9_tool_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    n = (eid % 4).cast("int")
    all_tools = F.array(F.lit("web_search"), F.lit("calculator"), F.lit("database_query"))
    tools = F.when(n == 0, F.array().cast("array<string>")).otherwise(
        F.slice(all_tools, 1, n)
    )
    # tool i's result: {'success': bit i of event_id}
    results = F.when(n == 0, F.map_from_arrays(
        F.array().cast("array<string>"),
        F.array().cast("array<struct<success:boolean>>"),
    )).otherwise(
        F.map_from_arrays(
            tools,
            F.transform(
                F.sequence(F.lit(0), n - 1),
                lambda i: F.struct((F.getbit(eid, i) == 1).alias("success")),
            ),
        )
    )
    df = events.select(
        "event_id", tools.alias("tools_used"), results.alias("tool_results")
    )
    return df.select(
        "event_id",
        F.size("tools_used").alias("tools_count"),
        ta.tool_success_rate(F.col("tool_results")).alias("success_rate"),
        F.array_join(ta.tool_categories(F.col("tools_used")), ",").alias("categories_str"),
    )


# --- P5/P45-P47 envelope pipeline: wrap -> route -> flatten -> aggregate -----------

_ENVELOPE_ORACLE = """
WITH synth AS (
  SELECT event_id, user_id, value,
    CASE event_id % 3
      WHEN 0 THEN 'marketo_lead_update'
      WHEN 1 THEN 'frontend_interaction'
      ELSE 'text_agent_turn_completed' END AS et
  FROM events
)
SELECT 'marketo' AS branch, count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM synth WHERE contains(et, 'marketo') AND NOT contains(et, 'activity')
UNION ALL
SELECT 'marketo_activity', count(*),
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
FROM synth WHERE contains(et, 'marketo') AND contains(et, 'activity')
UNION ALL
SELECT 'frontend', count(*),
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
FROM synth WHERE contains(et, 'frontend') OR contains(et, 'interaction')
UNION ALL
SELECT 'text_agent', count(*),
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
FROM synth WHERE contains(et, 'text_agent') OR contains(et, 'turn')
"""


@register(
    "p45_p47_envelope_routing",
    oracle=_ENVELOPE_ORACLE,
    tags=("transform", "dispatch", "envelope"),
    doc="P5 envelope construction + P46 substring routing + P47 flatten, "
    "end to end: a mixed synthetic stream is wrapped, split into the four "
    "source branches, flattened, and aggregated per branch (reference "
    "etl/transform/__init__.py:25-48, enhanced_kpi_consumer.py:103-112, "
    "snowflake_loader.py:173-188).",
)
def p45_p47_envelope_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from iheardai_data_pipeline_spark.functions.common import (
        deterministic_event_id,
        envelope,
    )
    from iheardai_data_pipeline_spark.functions.dispatch import (
        flatten_envelope,
        route_by_event_type,
    )

    events = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    et = (
        F.when(eid % 3 == 0, F.lit("marketo_lead_update"))
        .when(eid % 3 == 1, F.lit("frontend_interaction"))
        .otherwise(F.lit("text_agent_turn_completed"))
    )
    env = envelope(
        event_type=et,
        source="synthetic",
        data=F.struct(F.col("event_id"), F.col("user_id"), F.col("value")),
        event_id=deterministic_event_id("event_id"),
        ts_ms=F.col("event_id") * 1000,
    )
    enveloped = events.select(env.alias("ev")).select("ev.*")
    branches = route_by_event_type(enveloped)
    parts = [
        flatten_envelope(branch).agg(
            F.lit(name).alias("branch"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        for name, branch in branches.items()
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)
