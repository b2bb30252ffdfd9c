"""Multimodal kernels: the resize math itself (hand-checkable), the
raster layout, and the checksum summarizer."""

from __future__ import annotations

from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.operators.multimodal import (
    raster_checksums,
    resize_images,
)


def _media_df(spark, payload: bytes, media_id: int = 1):
    return spark.createDataFrame(
        [(media_id, "image", bytearray(payload), ("raw", None, None, None))],
        "media_id long, kind string, content binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:bigint>",
    )


def test_resize_nearest_neighbor_known_raster(spark):
    """16 bytes 0..15 lay into a 4x4 raster; 2x2 nearest-neighbor picks
    source rows/cols (0,2) -> pixels [0,2,8,10]."""
    media = _media_df(spark, bytes(range(16)))
    out = resize_images(media, width=2, height=2).collect()[0]
    assert bytes(out["content"]) == bytes([0, 2, 8, 10])
    assert out["meta"]["width"] == 2 and out["meta"]["height"] == 2


def test_resize_pads_non_square_payload(spark):
    """5 bytes -> sw=ceil(sqrt(5))=3, sh=2, padded with zeros; a 1x1
    resize samples img[0,0] = first byte."""
    media = _media_df(spark, bytes([9, 1, 2, 3, 4]))
    out = resize_images(media, width=1, height=1).collect()[0]
    assert bytes(out["content"]) == bytes([9])


def test_raster_checksums_sum_bytes(spark):
    media = _media_df(spark, bytes([1, 2, 250]))
    row = raster_checksums(media).collect()[0]
    assert row["n_bytes"] == 3 and row["pixel_sum"] == 253


def test_resize_then_checksum_composes(spark):
    media = _media_df(spark, bytes(range(16)))
    row = raster_checksums(resize_images(media, 2, 2)).collect()[0]
    assert row["n_bytes"] == 4 and row["pixel_sum"] == 0 + 2 + 8 + 10
