"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode/feature kernels are STUBBED (the image/audio libraries are
not in this container): `decode_image_batch` raises NotImplementedError
unless `fake=True`, in which case a deterministic fake decoder runs so
the Spark-side plumbing — schema, Arrow batch shape, mapInPandas
signature, partitioning — is real and tested end to end.

Mirrors the reference's binary-attachment handling (base64 attachments,
code/MEL/__init__.py:2109-2122) but columnar: BinaryType + struct
metadata instead of base64-in-JSON.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("phash", StringType(), True),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic fake: dims derived from the payload digest. Stands
    in for PIL/libvips until the real kernel is dropped in."""
    d = hashlib.md5(payload or b"").hexdigest()
    return int(d[:2], 16) + 16, int(d[2:4], 16) + 16, d[:16]


def decode_image_batch(pdf: pd.DataFrame, fake: bool) -> pd.DataFrame:
    if not fake:
        raise NotImplementedError(
            "real image decode requires PIL/libvips — not present in this "
            "container; pass fake=True for the deterministic stand-in"
        )
    rows = []
    for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
        w, h, ph = _fake_decode(bytes(payload) if payload is not None else b"")
        rows.append({"media_id": media_id, "width": w, "height": h, "phash": ph})
    return pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])


def extract_image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas over (media_id, payload) Arrow batches. Only the two
    needed columns cross the boundary; binary payloads stream in Arrow
    buffers (no base64 inflation, unlike the reference)."""
    narrow = media.where(F.col("kind") == "image").select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_image_batch(pdf, fake)

    return narrow.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_idx)
    to decode, exploded JVM-side so the decode stage is an even-width
    map over rows (partition-friendly). Decode itself is the stubbed
    kernel above."""
    return (
        media.where(F.col("kind") == "video")
        .withColumn("n_frames", (F.octet_length("payload") / 1024).cast("int") + 1)
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
        )
    )
