"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode kernels need codec libraries (PIL/ffmpeg/torchaudio) that are
NOT in this container — they are stubbed behind deterministic fakes /
NotImplementedError.  Everything Spark-side is real and tested: schemas,
partition-aware batching, mapInPandas signatures, and the
feature-extraction pipeline shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("data", T.BinaryType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
    T.StructField("n_bytes", T.LongType()),
])


def _fake_decode(data: bytes) -> list[float]:
    """Deterministic stand-in for a real image decode + embed: hashes the
    bytes into a fixed-length pseudo-feature.  REPLACE with a real codec
    (PIL + model) when the runtime has one."""
    h = 1469598103934665603
    for by in data[:4096]:
        h = ((h ^ by) * 1099511628211) % (1 << 64)
    out = []
    state = h
    for _ in range(8):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append(((state >> 40) / float(1 << 23)) - 1.0)
    return out


def extract_features(df: DataFrame, data_col: str = "data", id_col: str = "media_id",
                     batch_size: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    mapInPandas so each Python worker sees whole record batches (no
    per-row serde); at scale, repartition first so batches are
    size-bounded by spark.sql.execution.arrow.maxRecordsPerBatch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(bytes(x)) if x is not None else None
                for x in pdf[data_col]
            ]
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "feature": feats,
                "n_bytes": [len(bytes(x)) if x is not None else 0 for x in pdf[data_col]],
            })

    return df.mapInPandas(run, FEATURE_SCHEMA)


def decode_image(df: DataFrame, data_col: str = "data"):
    """Real image decode — requires a codec library not in this image."""
    raise NotImplementedError(
        "image decode needs PIL/libjpeg in the runtime; use extract_features"
        " (deterministic fake) for pipeline testing"
    )


def frame_sample(df: DataFrame, data_col: str = "data", every_n: int = 30):
    """Video frame sampling — requires ffmpeg bindings not in this image."""
    raise NotImplementedError("video decode needs ffmpeg in the runtime")


def synth_media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (binary payloads)."""
    rows = [
        (i, bytes([(i * 37 + j) % 256 for j in range(128 + (i % 5) * 32)]), "fake", 16, 16)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, IMAGE_SCHEMA)
