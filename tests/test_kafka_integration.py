"""End-to-end Kafka round-trip smoke test (reference S7/K1 core loop,
enhanced_kpi_consumer.py:86-101 / marketo_extractor.py:253-266).

SKIPPED BY DEFAULT: this rig ships neither a broker nor the
spark-sql-kafka connector jar. To run it for real:

1. Start a broker (docker-compose snippet in docs/COVERAGE.md):

       docker compose -f docs/kafka-smoke-compose.yml up -d

2. Launch pytest with the connector on the session and the broker
   address exported:

       export KAFKA_BOOTSTRAP=localhost:9092
       export PYSPARK_SUBMIT_ARGS="--packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0 pyspark-shell"
       python -m pytest tests/test_kafka_integration.py -q

The test produces a keyed JSON frame (kafka_message_frame) to a unique
topic, streams it back with read_kafka_stream, and checks the payloads
round-trip exactly.
"""

from __future__ import annotations

import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="set KAFKA_BOOTSTRAP (and the spark-sql-kafka package) to run "
    "the broker round-trip; see module docstring",
)


def test_kafka_roundtrip(spark, tmp_path):  # pragma: no cover - needs broker
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from iheardai_data_pipeline_spark.streaming.readers import read_kafka_stream
    from iheardai_data_pipeline_spark.streaming.sinks import kafka_message_frame

    topic = f"smoke-{uuid.uuid4().hex[:8]}"
    rows = [("s1", 1, "new"), ("s1", 2, "engaged"), ("s2", 1, "new")]
    df = spark.createDataFrame(rows, "session_id string, seq int, stage string")

    # K1 produce: keyed JSON frame -> broker
    (
        kafka_message_frame(df, key_col="session_id", topic=topic)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .save()
    )

    # S7 consume: subscribe, parse against the declared schema
    payload = StructType(
        [
            StructField("session_id", StringType()),
            StructField("seq", IntegerType()),
            StructField("stage", StringType()),
        ]
    )
    stream = read_kafka_stream(spark, BOOTSTRAP, (topic,), payload)
    q = (
        stream.select("data.*")
        .writeStream.format("memory")
        .queryName("kafka_smoke")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["session_id"], r["seq"], r["stage"])
        for r in spark.table("kafka_smoke").collect()
    }
    assert got == set(rows)
