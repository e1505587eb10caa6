"""Multimodal (image/audio/video) column plumbing.

North-star extension: treat media as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched Pandas functions via ``mapInPandas``.
The container has no image/audio codecs, so the decode step is STUBBED
(deterministic fake keyed on content bytes, or NotImplementedError for the
real-codec path) — but everything Spark-side is real and tested: schema,
batch iteration, output shapes, partition behavior.

Scale design: ``mapInPandas`` streams Arrow record batches through one
Python worker per core — decode cost parallelizes with executors, and
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak memory per
batch (media rows are large; set it low, e.g. 64, for 4K frames).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical media-table schema: opaque payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content_digest", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 16


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: derive ``dim``
    floats in [0, 1) from the sha256 of the payload. Same bytes -> same
    feature, so tests and oracle-style checks are reproducible."""
    digest = hashlib.sha256(payload).digest()
    need = dim * 2
    buf = (digest * (need // len(digest) + 1))[:need]
    return [
        int.from_bytes(buf[2 * i : 2 * i + 2], "big") / 65536.0 for i in range(dim)
    ]


def real_decode(payload: bytes, mime: str):  # pragma: no cover - stub
    """Real-codec decode: requires PIL/ffmpeg, not present in this
    environment. The Spark plumbing that would call it is fully wired."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "swap _fake_decode_features for a real decoder when they are"
    )


def extract_features(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over a media table.

    ``mapInPandas`` receives an iterator of pandas batches (Arrow transfer,
    never row-at-a-time pickling) and yields FEATURE_SCHEMA batches. The
    decode call is the stubbed deterministic fake."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "content_digest": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in payloads
                    ],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "feature": [
                        _fake_decode_features(bytes(p)) for p in payloads
                    ],
                }
            )

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payloads through the Pandas batch path and
    rewrites the metadata columns (real pixel work lives behind
    :func:`real_decode`). Keeps the payload opaque."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["width"] = width
            out["height"] = height
            yield out

    return df.mapInPandas(_resize, schema=df.schema)


def frame_sample_plan(df: DataFrame, every_ms: int) -> DataFrame:
    """Video frame-sampling *plan*: explode each video row into frame
    timestamps (duration/every_ms rows) with a deterministic frame key.
    The decode of each frame is the stubbed step; the explode + key
    assignment (the distributed part) is real."""
    frames = df.filter(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest((F.col("duration_ms") / every_ms).cast("long") - 1, F.lit(0)),
            )
        ).alias("frame_idx"),
    )
    return frames.select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
        F.concat_ws("_", F.col("media_id"), F.col("frame_idx")).alias("frame_key"),
    )


def chunk_plan(df: DataFrame, chunk_ms: int, media_type: str = "audio") -> DataFrame:
    """Fixed-length chunking *plan* for audio/video payloads: explode each
    media row into ``ceil(duration/chunk_ms)`` chunk rows with exact
    [start, end) boundaries and a deterministic chunk key — the
    partitioning step an ASR/captioning pipeline runs before per-chunk
    decode (the decode itself is the stubbed step, as with frames).
    Zero-shuffle: sequence-explode plus arithmetic, all codegen."""
    media = df.filter(F.col("media_type") == media_type).select(
        "media_id",
        "duration_ms",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.ceil(F.col("duration_ms") / chunk_ms).cast("long") - 1,
                    F.lit(0),
                ),
            )
        ).alias("chunk_idx"),
    )
    return media.select(
        "media_id",
        "chunk_idx",
        (F.col("chunk_idx") * chunk_ms).alias("chunk_start_ms"),
        F.least(
            (F.col("chunk_idx") + 1) * chunk_ms, F.col("duration_ms")
        ).alias("chunk_end_ms"),
        F.concat_ws("_", F.col("media_id"), F.col("chunk_idx")).alias("chunk_key"),
    )
