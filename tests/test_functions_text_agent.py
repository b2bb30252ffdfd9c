"""Golden tests for P29-P44 (reference text_agent_transformer.py semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.functions import text_agent as ta


def col_of(spark, c, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return [r["o"] for r in df.select(c.alias("o")).collect()]


def test_model_info(spark):
    rows = [("claude-3-sonnet",), ("gpt-4-turbo",), ("llama-2-7b-chat",), ("mystery",)]
    assert col_of(spark, ta.model_family(F.col("x")), rows, "x string") == [
        "claude", "gpt", "llama", "other",
    ]
    assert col_of(spark, ta.model_size(F.col("x")), rows, "x string") == [
        "unknown", "unknown", "small", "unknown",
    ]
    assert col_of(spark, ta.model_version(F.col("x")), rows, "x string") == [
        "3", "4", "2", None,
    ]
    caps = col_of(spark, ta.model_capabilities(F.col("x")), rows, "x string")
    assert caps[2] == ["instruction_following"]
    assert caps[3] == ["text_generation"]


def test_performance_metrics(spark):
    rows = [(100, 150, 2500.0), (100, 150, 0.0), (0, 150, 1000.0)]
    schema = "tokens_in int, tokens_out int, latency_ms double"
    assert col_of(
        spark, ta.tokens_per_second("tokens_out", "latency_ms"), rows, schema
    ) == [60.0, 0.0, 150.0]
    assert col_of(
        spark, ta.compression_ratio("tokens_out", "tokens_in"), rows, schema
    ) == [1.5, 1.5, 0.0]
    assert col_of(
        spark, ta.efficiency_score("tokens_out", "latency_ms"), rows, schema
    ) == [100, 0, 100]


def test_efficiency_buckets(spark):
    # tps = tokens_out with latency 1000ms
    rows = [(60,), (30,), (15,), (6,), (2,), (1,)]
    c = ta.efficiency_score(F.col("x"), F.lit(1000.0))
    assert col_of(spark, c, rows, "x int") == [100, 80, 60, 40, 20, 10]


def test_content_stats(spark):
    text = "Hello world. Visit http://x.io now! ```code``` ok?"
    rows = [(text,), ("",), (None,)]
    got = col_of(spark, ta.content_analysis(F.col("x")), rows, "x string")
    first = got[0]
    assert first["response_length"] == len(text)
    assert first["word_count"] == 7
    assert first["sentence_count"] == 4  # 'world.' + 'x.io' dots + '!' + '?'
    assert first["has_code_blocks"] is True
    assert first["has_links"] is True
    assert got[1]["word_count"] == 0
    assert got[1]["sentence_count"] == 0


def test_language_detection(spark):
    rows = [
        ("the cat and the dog is in it",),
        ("el gato y la casa es un perro",),
        ("le chat et un chien être en ville",),
        ("zzz qqq www",),
        ("",),
    ]
    got = col_of(spark, ta.detect_language(F.col("x")), rows, "x string")
    assert got == ["english", "spanish", "french", "english", "unknown"]
    # NOTE row 4: zero hits everywhere → english>=spanish>=french holds (0>=0),
    # reference returns 'english' for hitless non-empty text. Parity preserved.


def test_sentiment(spark):
    rows = [
        ("this is great and excellent",),
        ("terrible awful experience",),
        ("great but terrible",),   # 1 vs 1 → neutral
        ("",),
    ]
    got = col_of(spark, ta.sentiment(F.col("x")), rows, "x string")
    assert got == ["positive", "negative", "neutral", "neutral"]


def test_topics(spark):
    rows = [
        ("the product price is low, I recommend it",),
        ("hello there",),
        ("",),
    ]
    got = col_of(spark, ta.topics(F.col("x")), rows, "x string")
    assert got[0] == ["product_info", "recommendation"]
    assert got[1] == ["general"]
    assert got[2] == []


def test_tool_usage(spark):
    df = spark.createDataFrame(
        [
            (
                ["web_search", "calculator"],
                {"web_search": {"success": True}, "calculator": {"success": False}},
            ),
            (None, None),
        ],
        "tools_used array<string>, tool_results map<string,struct<success:boolean>>",
    )
    rates = [r["o"] for r in df.select(ta.tool_success_rate("tool_results").alias("o")).collect()]
    assert rates == [0.5, 1.0]
    cats = [r["o"] for r in df.select(ta.tool_categories("tools_used").alias("o")).collect()]
    assert cats[0] == ["calculation", "search"]
    assert cats[1] == []


def test_quality_metrics_demo_payload(spark):
    """Demo turn response (enhanced_pipeline_demo.py:74-99 flavor)."""
    text = (
        "I recommend the TechBook Pro 15 specifically for gaming. "
        "Here are the steps you can try to compare specifications. "
        "However, consider the price."
    )
    rows = [(text,)]
    comp = col_of(spark, ta.completeness_score(F.col("x")), rows, "x string")[0]
    # 50 + len>100 (+20) + '.' (+10) + however (+5) = 85
    assert comp == 85.0
    rel = col_of(spark, ta.relevance_score(F.col("x")), rows, "x string")[0]
    assert rel == 80.0  # 70 + specifically
    helpf = col_of(spark, ta.helpfulness_score(F.col("x")), rows, "x string")[0]
    # hits: here, steps, you can, try, recommend, consider? (consider not in list),
    # suggest no, help no, solution no, answer no, how to no → 5 hits = +25
    assert helpf == 85.0
    overall = col_of(spark, ta.overall_quality_score(F.col("x")), rows, "x string")[0]
    assert overall == round((85 + 80 + 85) / 3, 1)


def test_appropriateness_buckets(spark):
    rows = [("x", 5), ("x", 1500), ("x", 600), ("x", 200), ("x", 50), ("", 50)]
    got = col_of(
        spark,
        ta.response_appropriateness(F.col("t"), F.col("n")),
        rows,
        "t string, n int",
    )
    assert got == ["too_short", "very_long", "long", "appropriate", "concise", "empty"]


def test_cost_estimation(spark):
    rows = [("claude-3-sonnet", 1000, 2000), ("gpt-4", 1000, 2000), ("other-x", 500, 0)]
    schema = "model string, tokens_in int, tokens_out int"
    got = col_of(
        spark, ta.estimated_cost_usd("tokens_in", "tokens_out", "model"), rows, schema
    )
    # claude: 1*0.008 + 2*0.024 = 0.056 ; gpt family -> DEFAULT rates (reference
    # quirk): 1*0.01 + 2*0.02 = 0.05 ; other: 0.5*0.01 = 0.005
    assert got == pytest.approx([0.056, 0.05, 0.005])


def test_conversion_and_resolution(spark):
    rows = [
        ("you should buy it, add to cart",),
        ("please contact our specialist",),
        ("issue is solved and working",),
        ("sorry I cannot do that",),
        ("the sky is blue",),
        ("",),
    ]
    conv = col_of(spark, ta.conversion_indicators(F.col("x")), rows, "x string")
    assert conv[0] == ["purchase_intent"]
    assert conv[1] == ["contact_request"]
    assert conv[5] == []
    res = col_of(spark, ta.support_resolution(F.col("x")), rows, "x string")
    assert res == [
        "informational",  # 'buy...cart' has no resolution words... wait 'working'? no
        "escalation",
        "resolved",
        "unresolved",
        "informational",
        "unknown",
    ]


def test_business_value_score(spark):
    rows = [
        ("I recommend you buy this", 150),   # 50+30+10+15 = 100+ → 100
        ("sorry", 5),                        # 50-10-15 = 25
        ("neutral text", 50),                # 50
    ]
    got = col_of(
        spark, ta.business_value_score(F.col("t"), F.col("n")), rows, "t string, n int"
    )
    assert got == [100, 25, 50]


def test_transform_pipeline_smoke(spark):
    from iheardai_data_pipeline_spark.schemas import AGENT_TURN_RAW

    rows = [
        {
            "session_id": "sess_1",
            "turn_id": "turn_1",
            "user_id": "u1",
            "channel": None,
            "model": "claude-3-sonnet",
            "tokens_in": 150,
            "tokens_out": 320,
            "latency_ms": 2500.0,
            "response_text": "I recommend the product. Try it!",
            "timestamp": 1705315800000,
            "tools_used": ["product_search"],
            "tool_results": {"product_search": {"success": True}},
            "user_message": "hi",
            "metadata": None,
        }
    ]
    df = spark.createDataFrame(rows, AGENT_TURN_RAW)
    out = ta.transform_text_agent_turns(df).collect()[0]
    assert out["channel"] == "text"  # default when NULL
    assert out["model_info"]["model_family"] == "claude"
    assert out["performance_metrics"]["total_tokens"] == 470
    assert out["performance_metrics"]["tokens_per_second"] == 128.0
    assert out["tool_usage"]["tool_categories"] == ["search"]
    assert out["business_metrics"]["support_resolution_type"] == "troubleshooting"


def test_detect_language_ext_six_languages(spark):
    from iheardai_data_pipeline_spark.functions.text_agent import detect_language_ext
    from pyspark.sql import functions as F

    cases = [
        ("the house and the dog is in it", "en"),
        ("el perro de la casa es un que", "es"),
        ("le chien et à un il être en avoir", "fr"),
        ("der hund und die katze von den zu das", "de"),
        ("di che e il per un non sono", "it"),
        ("o que e do da em um para", "pt"),
        ("", "unknown"),
        ("xylophone zebra quartz", "unknown"),  # zero hits everywhere
        # tie at 1-1 between en ('the') and es ('la'): priority order -> en
        ("the la zzz", "en"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "t string")
    got = [
        r["lang"]
        for r in df.select(detect_language_ext(F.col("t")).alias("lang")).collect()
    ]
    assert got == [e for _, e in cases]
