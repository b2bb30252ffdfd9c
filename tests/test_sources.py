"""Batch source layer: declared-schema scans + incremental checkpoints
(SURVEY.md §2.1 S1/S2; reference marketo_extractor.py:54-226)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from iheardai_data_pipeline_spark.sources.batch import (
    Checkpoint,
    incremental_filter,
    read_csv,
    read_json,
)

SCHEMA = StructType(
    [
        StructField("lead_id", LongType()),
        StructField("email", StringType()),
        StructField("updated_at", LongType()),
    ]
)


def test_csv_scan_declared_schema(spark, tmp_path):
    p = tmp_path / "leads.csv"
    p.write_text("lead_id,email,updated_at\n1,a@x.com,100\n2,b@y.com,200\n")
    df = read_csv(spark, str(p), SCHEMA)
    assert [f.dataType for f in df.schema.fields] == [f.dataType for f in SCHEMA.fields]
    rows = {r["lead_id"]: r["email"] for r in df.collect()}
    assert rows == {1: "a@x.com", 2: "b@y.com"}


def test_json_scan_corrupt_record_quarantine(spark, tmp_path):
    p = tmp_path / "events.json"
    p.write_text('{"lead_id": 1, "email": "a@x.com", "updated_at": 100}\nnot-json\n')
    df = read_json(spark, str(p), SCHEMA).cache()
    ok = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert ok.count() == 1 and bad.count() == 1
    assert ok.first()["lead_id"] == 1


def test_incremental_checkpoint_roundtrip(spark, tmp_path):
    ckpt = Checkpoint(str(tmp_path / "ckpt.json"))
    assert ckpt.load() is None

    df = spark.createDataFrame(
        [(1, "a@x.com", 100), (2, "b@y.com", 200), (3, "c@z.com", 300)], SCHEMA
    )
    first = incremental_filter(df, "updated_at", ckpt.load())
    assert first.count() == 3
    ckpt.advance(first, "updated_at")
    assert ckpt.load() == 300

    # second run: only rows past the stored watermark survive
    second = incremental_filter(df, "updated_at", ckpt.load())
    assert second.count() == 0

    newer = spark.createDataFrame([(4, "d@w.com", 400)], SCHEMA)
    assert incremental_filter(df.union(newer), "updated_at", ckpt.load()).count() == 1


def test_infer_epoch_unit_rejects_pre2001_finer_units():
    """A wholly-pre-2001 millis column magnitude-classifies as seconds and
    would land ~year 30970 — the upper fence must reject it (and the
    analogous micros/nanos misreads) instead of silently shifting."""
    import pytest as _pytest

    from iheardai_data_pipeline_spark.sources.batch import infer_epoch_unit

    with _pytest.raises(ValueError):
        infer_epoch_unit(978_307_200_000)  # 2000-12-31 in ms, reads as s
    with _pytest.raises(ValueError):
        infer_epoch_unit(978_307_200_000_000)  # 2000-12-31 in µs, reads as ms
    with _pytest.raises(ValueError):
        infer_epoch_unit(978_307_200_000_000_000)  # 2000-12-31 in ns, reads as µs
    # legitimate post-2001 columns in every unit still infer cleanly
    assert infer_epoch_unit(1_700_000_000) == 1_000_000  # 2023 seconds
    assert infer_epoch_unit(1_700_000_000_000) == 1_000  # 2023 millis
    assert infer_epoch_unit(1_700_000_000_000_000) == 1  # 2023 micros
    assert infer_epoch_unit(1_700_000_000_000_000_000) == -1000  # 2023 nanos
