"""Golden tests for P6-P16 (reference marketo_transformer.py semantics),
fixtures from examples/enhanced_pipeline_demo.py:33-52,228-238."""

from __future__ import annotations

from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.functions import marketo


def col_of(spark, c, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return [r["o"] for r in df.select(c.alias("o")).collect()]


def test_normalize_email(spark):
    c = marketo.normalize_email(F.col("x"))
    got = col_of(
        spark, c,
        [("  JOHN.DOE@TechCorp.COM  ",), ("invalid-email",), ("a@b.io",), (None,)],
        "x string",
    )
    assert got == ["john.doe@techcorp.com", None, "a@b.io", None]


def test_normalize_phone_formats(spark):
    c = marketo.normalize_phone(F.col("x"))
    got = col_of(
        spark, c,
        [
            ("1-555-123-4567",),          # 11 digits leading 1
            ("(555) 987-6543",),          # 10 digits
            ("555.111.2222",),            # 10 digits dotted
            ("+44 20 7946 0958 ",),       # international passthrough (trimmed)
            (None,),
        ],
        "x string",
    )
    assert got == [
        "1-(555) 123-4567",
        "(555) 987-6543",
        "(555) 111-2222",
        "+44 20 7946 0958",
        None,
    ]


def test_normalize_lead_source(spark):
    c = marketo.normalize_lead_source(F.col("x"))
    got = col_of(
        spark, c,
        [("web",), ("ORGANIC SEARCH",), ("unknown source",), (None,)],
        "x string",
    )
    assert got == ["Website", "Organic Search", "Unknown Source", None]


def test_full_name_and_domain(spark):
    c = marketo.create_full_name(F.col("f"), F.col("l"))
    df_rows = [("John", "Doe"), ("John", None), (None, None)]
    got = col_of(spark, c, df_rows, "f string, l string")
    assert got == ["John Doe", "John", None]
    d = marketo.extract_email_domain(F.col("f"))
    got = col_of(spark, d, [("a@TechCorp.COM", "x"), ("bad", "x")], "f string, l string")
    assert got == ["techcorp.com", None]


def test_lead_quality_score_demo_payload(spark):
    """Demo lead (enhanced_pipeline_demo.py:33-52): business domain +20,
    5/5 fields +50, webinar +20, updated 'now' +10 => capped semantics."""
    rows = [
        (
            "john.doe@techcorp.com", "John", "Doe", "TechCorp", "CTO",
            "1-555-123-4567", "Webinar", "2024-01-15T10:30:00Z",
        )
    ]
    schema = (
        "email string, firstName string, lastName string, company string, "
        "title string, phone string, leadSource string, updatedAt string"
    )
    as_of = F.lit(1705315800000 + 3_600_000)  # 1h after updatedAt => <=1 day
    c = marketo.lead_quality_score(
        "email", "firstName", "lastName", "company", "title", "phone",
        "leadSource", "updatedAt", as_of_ms=as_of,
    )
    got = col_of(spark, c, rows, schema)
    assert got == [100]  # 20+50+20+10 = 100 (cap hit exactly)

    # freemail, no fields, unknown source, stale update => 5
    rows = [("a@gmail.com", None, None, None, None, None, "nope", "2020-01-01T00:00:00Z")]
    got = col_of(spark, marketo.lead_quality_score(
        "email", "firstName", "lastName", "company", "title", "phone",
        "leadSource", "updatedAt", as_of_ms=F.lit(1705315800000)), rows, schema)
    assert got == [5]


def test_activity_functions(spark):
    rows = [(2,), (104,), (999,)]
    assert col_of(spark, marketo.activity_type_name(F.col("x")), rows, "x int") == [
        "Fill Out Form", "Download Content", "Unknown Activity (999)",
    ]
    assert col_of(spark, marketo.activity_engagement_score(F.col("x")), rows, "x int") == [
        50, 40, 5,
    ]
    assert col_of(spark, marketo.activity_category(F.col("x")), rows, "x int") == [
        "form", "content", "other",
    ]


def test_activity_attributes_map(spark):
    df = spark.createDataFrame(
        [([{"name": "Form Name", "value": "Contact Us"}, {"name": "Page URL", "value": "x"}],)],
        "attrs array<struct<name:string,value:string>>",
    )
    got = df.select(marketo.activity_attributes_map("attrs").alias("o")).collect()[0]["o"]
    assert got == {"form_name": "Contact Us", "page_url": "x"}
