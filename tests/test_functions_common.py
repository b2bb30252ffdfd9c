"""Golden tests for P1-P5 (reference base_transformer.py semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.functions import common


def _one(spark, col, **data):
    """Evaluate a column expression against a single-row DataFrame."""
    df = spark.createDataFrame([data])
    return df.select(col.alias("out")).collect()[0]["out"]


def test_standardize_timestamp_boundaries(spark):
    c = common.standardize_timestamp_ms(F.col("x"))
    # > 1e12 => already ms
    assert _one(spark, c, x=1705315800000) == 1705315800000
    # <= 1e12 => seconds * 1000 (exact cutoff value is seconds)
    assert _one(spark, c, x=1000000000000) == 1000000000000000
    assert _one(spark, c, x=1705315800) == 1705315800000
    # ISO string with Z
    df = spark.createDataFrame([("2024-01-15T10:30:00Z",)], "x string")
    assert df.select(c.alias("o")).collect()[0]["o"] == 1705314600000
    # numeric string follows the numeric path (Python isinstance(str) differs,
    # but fromisoformat would fail -> reference falls to now(); we take the
    # deterministic numeric interpretation)
    # unparseable -> NULL (documented deviation from reference's now())
    df = spark.createDataFrame([("not a time",)], "x string")
    assert df.select(c.alias("o")).collect()[0]["o"] is None


def test_redact_pii(spark):
    c = common.redact_pii(F.col("x"))
    cases = {
        "mail me at john.doe@example.com ok": "mail me at [EMAIL_REDACTED] ok",
        "call 555-123-4567 now": "call [PHONE_REDACTED] now",
        # reference quirk, preserved: '\b\(' can never match after a space
        # (no word boundary between ' ' and '('), so paren-phones survive
        "call (555) 123-4567 now": "call (555) 123-4567 now",
        "call(555) 123-4567 now": "call[PHONE_REDACTED] now",
        "card 4111 1111 1111 1111 end": "card [CARD_REDACTED] end",
        "card 4111-1111-1111-1111 end": "card [CARD_REDACTED] end",
        "ssn 123-45-6789 end": "ssn [SSN_REDACTED] end",
    }
    for src, want in cases.items():
        df = spark.createDataFrame([(src,)], "x string")
        assert df.select(c.alias("o")).collect()[0]["o"] == want, src


def test_normalize_string(spark):
    c = common.normalize_string(F.col("x"))
    df = spark.createDataFrame([("  hi  ",), ("",), ("   ",), (None,)], "x string")
    assert [r["o"] for r in df.select(c.alias("o")).collect()] == ["hi", None, None, None]


def test_envelope_shape(spark):
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    env = df.select(
        common.envelope(
            "t.e", "src", F.struct("id", "v"), event_id=F.lit("e1"), ts_ms=F.lit(123)
        ).alias("e")
    ).collect()[0]["e"]
    assert env["event_id"] == "e1"
    assert env["event_type"] == "t.e"
    assert env["source"] == "src"
    assert env["ts_ms"] == 123
    assert env["data"]["id"] == 1
    assert env["metadata"]["transformation"]["version"] == "1.0.0"
