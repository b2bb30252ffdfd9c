"""K1 Kafka message shape + T8 progress listener."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.streaming.monitoring import ProgressMonitor
from iheardai_data_pipeline_spark.streaming.sinks import kafka_message_frame


def test_kafka_message_frame_shape(spark):
    df = spark.createDataFrame(
        [(1, "s-1", 2.5), (2, "s-2", 3.5)], "lead_id bigint, session_id string, score double"
    )
    msg = kafka_message_frame(df, key_col="session_id", topic="leads.delta")
    assert msg.columns == ["key", "value", "topic"]
    rows = {r["key"]: r for r in msg.collect()}
    assert set(rows) == {"s-1", "s-2"}
    payload = json.loads(rows["s-1"]["value"])
    assert payload == {"lead_id": 1, "session_id": "s-1", "score": 2.5}
    assert rows["s-1"]["topic"] == "leads.delta"


def test_progress_monitor_collects_and_alerts(spark, sf_dir):
    from iheardai_data_pipeline_spark.streaming.readers import read_events_stream

    mon = ProgressMonitor(lag_alert_rows=10)
    spark.streams.addListener(mon)
    try:
        stream = read_events_stream(spark, sf_dir)
        agg = stream.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        q = (
            agg.writeStream.format("memory")
            .queryName("t8_probe")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener callbacks are async; give the bus a moment
        for _ in range(50):
            if mon.progress:
                break
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(mon)
    assert mon.progress, "no progress events captured"
    assert sum(p.num_input_rows for p in mon.progress) > 0
    # the sf0.001 events table exceeds the 10-row alert threshold in one trigger
    assert mon.alerts
