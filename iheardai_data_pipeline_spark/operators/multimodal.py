"""Multimodal column plumbing (north-star set).

Media ride as opaque ``binary`` columns with a typed metadata struct;
decode / feature-extraction run as Arrow-batched ``mapInPandas``
operators so a 100 TB corpus streams through executors in columnar
batches without ever materializing rows on the driver.

The image/audio codec libraries are NOT in this container, so the
codec DECODE step is a deterministic stand-in behind the same
signatures (documented per kernel); everything after decode — the
nearest-neighbor resize math, frame slicing, feature folds — and all
the Spark-side machinery (schema, partitioning, batch iteration,
output contract) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        # double, not float: features must hash-match the DuckDB oracle's
        # exact b/255.0 values (float32 truncation would drift ~1e-8)
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def attach_fake_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Test-rig media table: documents' text bytes as the opaque payload
    (real pipelines get the bytes from object storage)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _stub_decode_features(content: bytes) -> list[float]:
    """STUB decode kernel: deterministic pseudo-features from a sha256 of
    the payload. A real deployment replaces this one function with
    PIL/torchvision/ffmpeg decoding — the operator around it is unchanged.
    """
    digest = hashlib.sha256(content).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_media_features(media: DataFrame, batch_decoder=None) -> DataFrame:
    """Decode + featurize media payloads via Arrow-batched mapInPandas.

    ``batch_decoder(content: bytes) -> list[float]`` pluggable; defaults
    to the deterministic stub (no codec libs in this container).
    """
    from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism

    decoder = batch_decoder or _stub_decode_features
    media = ensure_parallelism(media)

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "features": pdf["content"].map(decoder),
                }
            )

    return media.mapInPandas(op, schema=_FEATURE_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_start", T.LongType(), False),
        T.StructField("frame_len", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video-like payloads: each media row fans out to
    ``n_frames`` evenly-spaced frames, one output row per frame, through
    the same Arrow-batched ``mapInPandas`` shell as feature extraction.

    STUB decode: a real deployment seeks keyframes with ffmpeg/pyav and
    featurizes the decoded image; this container has no codecs, so the
    "frame" is the i-th even slice of the payload (decoded as UTF-8 and
    sliced by character so the DuckDB oracle can reproduce it — blob
    slicing isn't ANSI) and its features are sha256-derived, exactly like
    ``extract_media_features``. The operator shape — partition-parallel
    fan-out, typed frame schema, per-batch vectorized kernel — is the
    production shape.
    """
    from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism

    media = ensure_parallelism(media)

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [],
                "kind": [],
                "frame_idx": [],
                "frame_start": [],
                "frame_len": [],
                "features": [],
            }
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                text = bytes(content).decode("utf-8")
                n = len(text)
                for i in range(n_frames):
                    a, b = (i * n) // n_frames, ((i + 1) * n) // n_frames
                    digest = hashlib.sha256(text[a:b].encode("utf-8")).digest()
                    out["media_id"].append(mid)
                    out["kind"].append(kind)
                    out["frame_idx"].append(i)
                    out["frame_start"].append(a)
                    out["frame_len"].append(b - a)
                    out["features"].append([c / 255.0 for c in digest[:FEATURE_DIM]])
            yield pd.DataFrame(out)

    return media.mapInPandas(op, schema=_FRAME_SCHEMA)


def _raster_of(content: bytes) -> tuple:
    """Deterministic grayscale raster from an opaque payload: bytes laid
    into a square-ish (sh x sw) array, zero-padded. The codec-decode
    stand-in of this family (no image libs in the container) — swap for
    PIL/opencv decoding in production; everything downstream operates on
    the ndarray and is real."""
    import math

    import numpy as np

    arr = np.frombuffer(content, dtype=np.uint8)
    n = arr.size
    sw = max(1, math.ceil(math.sqrt(n)))
    sh = max(1, -(-n // sw))
    img = np.zeros(sh * sw, dtype=np.uint8)
    img[:n] = arr
    return img.reshape(sh, sw), sh, sw


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor image resize via Arrow-batched ``mapInPandas``.

    The resize itself is the real production algorithm, fully
    vectorized: source row/col index per output pixel is
    ``(y * src_h) // height`` / ``(x * src_w) // width`` (pure integer
    arithmetic — engine-portable, so the DuckDB oracle reproduces every
    output byte), gathered with one ``np.ix_`` fancy-index per image.
    Only the codec decode is a stand-in (:func:`_raster_of`; PIL/opencv
    absent here) — plug a real decoder and the kernel is unchanged.
    Output rows keep MEDIA_SCHEMA with the resized raster as content
    and width/height set in meta.
    """
    from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism

    media = ensure_parallelism(media)

    def op(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        ys_base = np.arange(height)
        xs_base = np.arange(width)
        for pdf in batches:
            out_content = []
            for content in pdf["content"]:
                img, sh, sw = _raster_of(bytes(content))
                ys = (ys_base * sh) // height
                xs = (xs_base * sw) // width
                out_content.append(img[np.ix_(ys, xs)].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": out_content,
                    "meta": [
                        {
                            "mime": "image/x-raw-gray",
                            "width": width,
                            "height": height,
                            "duration_ms": None,
                        }
                    ]
                    * len(pdf),
                }
            )

    return media.mapInPandas(op, schema=MEDIA_SCHEMA)


_RASTER_SUM_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("pixel_sum", T.LongType(), False),
    ]
)


def raster_checksums(media: DataFrame) -> DataFrame:
    """Row-local byte-sum summary of media payloads (media_id, n_bytes,
    pixel_sum) — the oracle-comparable projection of a binary column
    (binary cells themselves can't be value-hash-compared across
    engines; their exact byte sums can)."""

    def op(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            arrs = [np.frombuffer(bytes(c), dtype=np.uint8) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [int(a.size) for a in arrs],
                    "pixel_sum": [int(a.sum()) for a in arrs],
                }
            )

    return media.mapInPandas(op, schema=_RASTER_SUM_SCHEMA)
