"""applyInPandasWithState session-state operator (T6/K5/J4/W3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.operators.mutations import last_write_wins
from iheardai_data_pipeline_spark.sources.batch import load_table
from iheardai_data_pipeline_spark.streaming.stateful import track_session_state


def test_session_state_carries_across_micro_batches(spark, sf_dir, tmp_path):
    """Stream the events table as TWO files / two micro-batches: the final
    per-key snapshot must equal the batch rollup of the full table,
    proving state survives the batch boundary, and every key touched in
    both batches must have emitted a strictly-growing snapshot per batch."""
    events = load_table(spark, sf_dir, "events")
    # deterministic 2-way split on event_id parity, one parquet dir each
    src = tmp_path / "src"
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        str(src), mode="overwrite"
    )
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        str(src), mode="append"
    )

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    snapshots = track_session_state(stream, ttl_ms=None)
    q = (
        snapshots.writeStream.format("memory")
        .queryName("t6_unit")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("t6_unit")

    # each key appears once per micro-batch that touched it
    per_key = out.groupBy("user_id").count()
    assert per_key.filter(F.col("count") > 2).count() == 0

    final = last_write_wins(out, ["user_id"], ["n_events", "last_seen_s"])
    expected = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.unix_seconds(F.min("ts")).alias("started_at_s"),
        F.unix_seconds(F.max("ts")).alias("last_seen_s"),
        F.max("event_id").alias("max_event_id"),
    )
    got = {
        r["user_id"]: (
            r["n_events"],
            round(r["sum_value"], 2),
            r["started_at_s"],
            r["last_seen_s"],
            r["max_event_id"],
        )
        for r in final.collect()
    }
    want = {
        r["user_id"]: (
            r["n_events"],
            round(r["sum_value"], 2),
            r["started_at_s"],
            r["last_seen_s"],
            r["max_event_id"],
        )
        for r in expected.collect()
    }
    assert got == want
    # two micro-batches really happened: some key snapshotted twice
    assert per_key.filter(F.col("count") == 2).count() > 0
