"""Kafka parse-path parity WITHOUT a broker (carried from r6 #9 / r7 #8
/ r8 #6): the reference consumes THREE topics of enveloped JSON
(enhanced_kpi_consumer.py:86-101) and logs-and-skips corrupt records
(:320-342). ``read_kafka_stream``'s entire behavior past the socket is
``parse_kafka_records`` over the source's wire schema — so replaying
identical 3-topic traffic through a file stream with that exact wire
schema exercises everything the env-gated broker test would, except
the socket itself (tests/test_kafka_integration.py stays the
documented, env-gated wire check)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from iheardai_data_pipeline_spark.functions.dispatch import route_by_event_type
from iheardai_data_pipeline_spark.streaming.readers import (
    KAFKA_WIRE_SCHEMA,
    parse_kafka_records,
    read_file_stream,
)
from iheardai_data_pipeline_spark.streaming.sinks import kafka_message_frame

# the reference's consumer parses a flat envelope; declared, no inference
PAYLOAD = StructType(
    [
        StructField("event_id", StringType()),
        StructField("event_type", StringType()),
        StructField("source", StringType()),
        StructField("ts_ms", LongType()),
        StructField("payload", StringType()),
    ]
)

TOPICS = ("marketo.leads", "frontend.events", "agent.conversations")


def _traffic(spark):
    """3-topic enveloped traffic (via the PRODUCER path — the same
    kafka_message_frame the wire test uses) + 4 corrupt/edge records."""
    rows = []
    for i, (topic, etype) in enumerate(
        [
            (TOPICS[0], "marketo_lead"),
            (TOPICS[0], "marketo_activity"),
            (TOPICS[1], "frontend_interaction"),
            (TOPICS[1], "frontend_click"),
            (TOPICS[2], "text_agent_turn"),
            (TOPICS[2], "text_agent_turn"),
        ]
    ):
        rows.append((f"k{i}", f"e{i}", etype, "engine", 1000 + i, f"p{i}", topic))
    env = spark.createDataFrame(
        rows,
        "key string, event_id string, event_type string, source string,"
        " ts_ms long, payload string, topic string",
    )
    # one producer frame per topic, via the SAME kafka_message_frame the
    # env-gated wire test produces with (key = partition key, value =
    # whole-row JSON, topic literal)
    per_topic = [
        kafka_message_frame(
            env.where(F.col("topic") == t).select(
                "key", "event_id", "event_type", "source", "ts_ms", "payload"
            ),
            key_col="key",
            topic=t,
        )
        for t in TOPICS
    ]
    good = per_topic[0].unionByName(per_topic[1]).unionByName(per_topic[2])
    corrupt = spark.createDataFrame(
        [
            ("bad1", '{"event_id": "e9", "event_type":', TOPICS[0]),
            ("bad2", "not json at all", TOPICS[1]),
            ("bad3", "", TOPICS[2]),
            ("bad4", None, TOPICS[2]),
        ],
        "key string, value string, topic string",
    )
    return good.unionByName(corrupt)


def _as_wire(df):
    """Project (key, value, topic) into the Kafka source's EXACT wire
    schema: binary key/value, partition/offset/timestampType ints."""
    wire = df.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        "topic",
        F.lit(0).cast("int").alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("timestamp"),
        F.lit(0).cast("int").alias("timestampType"),
    )
    # name/type parity with the source's wire schema (literal columns
    # come back non-nullable; nullability is irrelevant to the parse)
    assert [(f.name, f.dataType) for f in wire.schema.fields] == [
        (f.name, f.dataType) for f in KAFKA_WIRE_SCHEMA.fields
    ]
    return wire


def test_stream_parse_equals_batch_parse(spark, tmp_path):
    """The SAME wire rows parsed through a real (file) stream and as a
    batch frame produce identical rows and an identical schema — the
    parse path has no streaming/batch divergence to hide behind."""
    wire = _as_wire(_traffic(spark))
    src = str(tmp_path / "wire")
    wire.write.parquet(src)

    stream = parse_kafka_records(
        read_file_stream(spark, src, KAFKA_WIRE_SCHEMA), PAYLOAD
    )
    out = str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.read.parquet(out)

    batch = parse_kafka_records(spark.read.parquet(src), PAYLOAD)
    assert streamed.schema == batch.schema
    key = lambda r: (r["key"] or "", r["topic"])
    s_rows = sorted(streamed.collect(), key=key)
    b_rows = sorted(batch.collect(), key=key)
    assert [r.asDict() for r in s_rows] == [r.asDict() for r in b_rows]
    assert len(s_rows) == 10


def test_corrupt_records_skip_not_crash(spark):
    """Reference contract (enhanced_kpi_consumer.py:320-342): corrupt
    payloads never kill the batch — they parse to NULL data with the
    original bytes preserved, and the skip-filter drops exactly them."""
    parsed = parse_kafka_records(_as_wire(_traffic(spark)), PAYLOAD)
    rows = {r["key"]: r for r in parsed.collect()}
    for bad in ("bad1", "bad2", "bad3"):
        assert rows[bad]["data"] is None or all(
            v is None for v in rows[bad]["data"].asDict().values()
        ), bad
    assert rows["bad2"]["raw_value"] == "not json at all"  # bytes kept
    assert rows["bad4"]["raw_value"] is None  # null value stays null
    good = parsed.where(
        F.col("data").isNotNull() & F.col("data.event_id").isNotNull()
    )
    assert good.count() == 6
    # every good payload round-trips the producer's JSON exactly
    for r in good.collect():
        assert json.loads(r["raw_value"])["event_id"] == r["data"]["event_id"]


def test_three_topic_routing_after_parse(spark):
    """Parse -> flatten -> substring router: each record lands in
    exactly one branch, per the reference's consumer routing
    (enhanced_kpi_consumer.py:103-112)."""
    parsed = parse_kafka_records(_as_wire(_traffic(spark)), PAYLOAD)
    flat = parsed.where(F.col("data.event_id").isNotNull()).select(
        "topic", "data.*"
    )
    routed = route_by_event_type(flat)
    counts = {name: df.count() for name, df in routed.items()}
    assert counts == {
        "marketo": 1,
        "marketo_activity": 1,
        "frontend": 2,
        "text_agent": 2,
    }
    # topic alignment: routed branches only carry their topic's traffic
    assert set(
        r["topic"] for r in routed["text_agent"].select("topic").collect()
    ) == {TOPICS[2]}
