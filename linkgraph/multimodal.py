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
    BinaryType,
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
    plumbing (batching, schema, ordering) is testable.

    dtype is pinned little-endian ('<u2'), NOT native uint16: the DuckDB
    driver oracle recomputes each u from sha256 hex pairs assuming LE byte
    order, so a native dtype would silently flip every feature on a
    big-endian host and fail the gate for a correct engine.
    """
    # a sha256 digest is 32 bytes = at most 16 LE-uint16 features; raising
    # FEATURE_DIM past that would silently truncate here while the driver
    # oracle's SQL fan-out reads past the 64-char hex string — fail loudly
    # at the definition site instead
    if FEATURE_DIM * 2 > hashlib.sha256().digest_size:
        raise ValueError(
            f"FEATURE_DIM={FEATURE_DIM} exceeds sha256 capacity "
            f"({hashlib.sha256().digest_size // 2} uint16 features)"
        )
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype="<u2")
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


# --------------------------------------------------- resize / frame-sample

RESIZED_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("payload", BinaryType(), False),
    ]
)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a pixel resize: tagged header + payload
    digest, so tests can assert the batch shape, parameter plumbing and
    determinism without an image library. Swap for PIL's
    ``Image.resize((width, height))`` on a real cluster — the surrounding
    mapInPandas shape is exactly what the real kernel runs in."""
    head = b"RSZv1|%d|%d|" % (width, height)
    return head + hashlib.sha256(payload or b"").digest()[:16]


def resize_media(
    df: DataFrame, key_col: str, payload_col: str, width: int, height: int
) -> DataFrame:
    """binary -> binary resize plumbing: (key, width, height, payload).

    Arrow-batched mapInPandas, one pass per batch; the pixel kernel
    (``fake_resize``) is the pluggable part — the schema, the parameter
    closure, and the batch shape are the production surface."""
    src = df.select(
        F.col(key_col).cast("string").alias("key"), F.col(payload_col).alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "key": pdf["key"],
                    "width": np.int64(width),
                    "height": np.int64(height),
                    "payload": pdf["payload"].map(lambda b: fake_resize(b, width, height)),
                }
            )

    return src.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("frame_no", LongType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("frame", BinaryType(), False),
    ]
)

FRAME_BYTES = 64  # fake "frame" chunk size
FRAME_INTERVAL_MS = 1000


def fake_frame_iter(payload: bytes, every_n: int):
    """Deterministic frame sampler stand-in: treat the payload as a stream
    of FRAME_BYTES chunks ("frames") and keep every ``every_n``-th. A real
    cluster swaps this for pyav/ffmpeg keyframe extraction; the fan-out
    row shape below is unchanged."""
    payload = payload or b""
    total = max(1, (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES)
    for i in range(0, total, every_n):
        chunk = payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
        yield i, i * FRAME_INTERVAL_MS, chunk


def sample_video_frames(
    df: DataFrame, key_col: str, payload_col: str, every_n: int = 2
) -> DataFrame:
    """Frame-sampling plumbing: ONE input row fans out to MANY frame rows
    (key, frame_no, ts_ms, frame) — the shape a video pipeline needs
    (mapInPandas may emit any number of output rows per input batch, which
    is exactly the property this exercises). Partition-parallel: each
    video's frames are produced where its payload row lives; no shuffle."""
    src = df.select(
        F.col(key_col).cast("string").alias("key"), F.col(payload_col).alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, nos, tss, frames = [], [], [], []
            for key, payload in zip(pdf["key"], pdf["payload"]):
                for no, ts, chunk in fake_frame_iter(payload, every_n):
                    keys.append(key)
                    nos.append(no)
                    tss.append(ts)
                    frames.append(chunk)
            yield pd.DataFrame(
                {
                    "key": pd.Series(keys, dtype="string"),
                    "frame_no": pd.Series(nos, dtype="int64"),
                    "ts_ms": pd.Series(tss, dtype="int64"),
                    "frame": pd.Series(frames, dtype=object),
                }
            )

    return src.mapInPandas(run, schema=FRAME_SCHEMA)
