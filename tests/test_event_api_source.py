"""Custom Python Data Source (event_api): batch pages + streaming offsets."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.sources.event_api import EventApiDataSource


def _write_page(path: str, n: int, start_id: int, count: int) -> None:
    with open(os.path.join(path, f"page-{n:04d}.jsonl"), "w") as f:
        for i in range(count):
            f.write(
                json.dumps(
                    {
                        "event_id": f"e{start_id + i}",
                        "ts_ms": 1_700_000_000_000 + (start_id + i) * 1000,
                        "user_id": (start_id + i) % 5,
                        "event_type": "click",
                        "value": 1.5,
                    }
                )
                + "\n"
            )


def test_batch_read_pages_in_parallel(spark, tmp_path):
    api = tmp_path / "api"
    api.mkdir()
    _write_page(str(api), 0, 0, 10)
    _write_page(str(api), 1, 10, 7)
    spark.dataSource.register(EventApiDataSource)
    df = spark.read.format("event_api").option("path", str(api)).load()
    assert df.count() == 17
    assert df.rdd.getNumPartitions() == 2  # one partition per page
    assert df.filter(F.col("event_id") == "e16").count() == 1


def test_stream_offsets_resume_like_since_checkpoint(spark, tmp_path):
    api = tmp_path / "api"
    api.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _write_page(str(api), 0, 0, 5)
    spark.dataSource.register(EventApiDataSource)

    def run_once() -> int:
        # memory sink can't recover a checkpoint; a real (parquet) sink can
        q = (
            spark.readStream.format("event_api")
            .option("path", str(api))
            .load()
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).count()

    assert run_once() == 5
    # new page arrives; a restarted query reads ONLY the new page —
    # the offset in the checkpoint is the reference's `since` watermark
    _write_page(str(api), 1, 5, 3)
    assert run_once() == 8  # 5 old (not re-read) + 3 new appended
