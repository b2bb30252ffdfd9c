"""Multimodal column plumbing (north-star set).

Media ride as opaque ``binary`` columns with a typed metadata struct;
decode / feature-extraction run as Arrow-batched ``mapInPandas``
operators so a 100 TB corpus streams through executors in columnar
batches without ever materializing rows on the driver.

The image/audio codec libraries are NOT in this container, so the
decode kernels are deterministic stubs behind the same signatures
(documented below); the Spark-side machinery — schema, partitioning,
batch iteration, output contract — is real and tested.
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


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize operator — signature + plumbing only.

    Raises NotImplementedError from the kernel: PIL is not in this
    container. The mapInPandas shell is identical to
    ``extract_media_features``; only the per-batch kernel differs.
    """

    def op(batches: Iterator) -> Iterator:
        raise NotImplementedError(
            "image decode requires PIL/opencv, not available in this container; "
            "plug a real kernel into the mapInPandas shell"
        )
        yield  # pragma: no cover

    return media.mapInPandas(op, schema=MEDIA_SCHEMA)
