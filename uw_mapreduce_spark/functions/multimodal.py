"""Multimodal (image/audio/video) column plumbing.

Design: media ride through the engine as opaque ``binary`` columns with
a typed metadata struct; decode / feature-extraction are Arrow-batched
``mapInPandas`` stages so the Python cost is per-BATCH, not per-row, and
the Spark-side schema, partitioning, and batch shape are real.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
decode step is stubbed: ``decode_image``/``decode_audio`` raise
``NotImplementedError`` with the intended contract, and
``fake_features`` computes a deterministic stand-in (byte stats) so the
pipeline is testable end-to-end.  Swapping in a real decoder changes
ONE function, no plan changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("mime", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("byte_mean", DoubleType(), True),
        StructField("byte_histogram", ArrayType(LongType()), True),
    ]
)


def attach_media(df: DataFrame, id_col: str, payload_col: str, kind: str = "image") -> DataFrame:
    """Normalize any binary payload column into the engine's media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.length(F.col(payload_col).cast("binary")).cast("long").alias("n_bytes"),
        F.lit(f"application/x-{kind}").alias("mime"),
    )


def decode_image(payload: bytes) -> "object":
    """STUB — real implementation: PIL.Image.open(io.BytesIO(payload)),
    resize/convert, return HWC uint8 array.  Codec libs absent here."""
    raise NotImplementedError("image decode requires PIL; not available in this environment")


def decode_audio(payload: bytes) -> "object":
    """STUB — real implementation: soundfile/librosa load, resample,
    return PCM float array.  Codec libs absent here."""
    raise NotImplementedError("audio decode requires librosa/soundfile")


def fake_features(payload: bytes, bins: int = 8) -> tuple[float, list[int]]:
    """Deterministic stand-in for a decoder: byte mean + coarse histogram."""
    if payload is None or len(payload) == 0:
        return 0.0, [0] * bins
    hist = [0] * bins
    total = 0
    for byte in payload:
        hist[byte * bins // 256] += 1
        total += byte
    return total / len(payload), hist


def extract_features(media: DataFrame, bins: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    ``mapInPandas`` processes whole record batches; the stubbed
    ``fake_features`` sits exactly where a decoder would.  Output schema,
    partitioning, and batch shape are the production ones.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_features(p, bins) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "byte_mean": [f[0] for f in feats],
                    "byte_histogram": [f[1] for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
