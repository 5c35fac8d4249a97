"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct (mime, width/height/duration, ...). The Spark-side plumbing
— schema, partition-friendly batch shapes, Arrow-batched UDF signatures —
is real and tested; the actual media DECODE step is stubbed because no
image/audio libraries exist in this container:

- ``decode_image_batch`` raises ``NotImplementedError`` (clearly marked
  stub; swap in PIL/libvips on a real cluster), and
- ``fake_feature_extractor`` provides a deterministic hash-derived feature
  vector so the distributed plumbing (mapInPandas over binary columns,
  fixed-width ``array<float>`` output) can be exercised end-to-end in tests.

The ``html: binary`` column of the pages table doubles as the test payload.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 16

MEDIA_META_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("mime", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)


def decode_image_batch(payloads: pd.Series) -> pd.Series:
    """STUB — media decode needs an image library not present in this
    container. On a real cluster: PIL.Image.open(io.BytesIO(b)) per batch
    element inside the same mapInPandas shape used below."""
    raise NotImplementedError(
        "media decode requires PIL/libvips; not available in this sandbox"
    )


def fake_feature_extractor(payload: bytes) -> np.ndarray:
    """Deterministic FEATURE_DIM-float vector from the payload bytes
    (sha256-derived). Stands in for a real embedding model so the Spark
    plumbing (batching, schema, ordering) is testable."""
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
    return (raw.astype(np.float32) / 65535.0).astype(np.float32)


def extract_media_features(
    df: DataFrame, key_col: str, payload_col: str, mime: str = "text/html"
) -> DataFrame:
    """binary column -> (key, mime, n_bytes, features: array<float>).

    mapInPandas over Arrow batches; one numpy pass per batch, no per-row
    Python in the Spark plan (the extractor itself is the pluggable part).
    """
    src = df.select(
        F.col(key_col).cast("string").alias("key"), F.col(payload_col).alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_feature_extractor(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "key": pdf["key"],
                    "mime": mime,
                    "n_bytes": pdf["payload"].map(lambda b: len(b or b"")).astype("int64"),
                    "features": pd.Series(feats, index=pdf.index, dtype=object),
                }
            )

    return src.mapInPandas(run, schema=MEDIA_META_SCHEMA)
