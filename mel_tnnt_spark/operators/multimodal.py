"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, decoded by REAL pure-python kernels where the format
allows, stubs only where a codec library would be required.

Real kernels (no external libs — container-safe):
- image decode: BMP (24-bit uncompressed, BITMAPINFOHEADER byte
  parsing) and binary PPM (P6) -> numpy HxWx3 RGB;
- image features: width/height + a real 64-bit average-hash (aHash:
  8x8 nearest-neighbor grayscale downsample, threshold at the mean) —
  format-independent (same pixels in BMP or PPM hash identically,
  test-pinned);
- image resize: nearest-neighbor to WxH, re-encoded as P6 PPM bytes;
- audio decode: WAV via the stdlib `wave` module -> sample rate,
  channels, duration, RMS, zero-crossing rate (16-bit PCM).

Codec formats (JPEG/PNG/MP3/H.264...) still raise NotImplementedError
unless `fake=True` routes to the deterministic stand-in — the
sanctioned stub, since no codec lib ships in this container. The
Spark-side plumbing (schema, Arrow batch shape, mapInPandas signature,
partitioning, frame-sample plan) is identical for real and stubbed
kernels.

Mirrors the reference's binary-attachment handling (base64 attachments,
code/MEL/__init__.py:2109-2122) but columnar: BinaryType + struct
metadata instead of base64-in-JSON.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
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

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("rms", DoubleType(), True),
        StructField("zero_crossing_rate", DoubleType(), True),
    ]
)


# --- real image kernels ------------------------------------------------------


def py_decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> HxWx3 RGB. Pure byte parsing:
    pixel-array offset @10, width @18, height @22 (positive = stored
    bottom-up), bpp @28, compression @30 (must be BI_RGB=0). Rows are
    padded to 4-byte multiples; channel order on disk is BGR."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width = struct.unpack_from("<i", payload, 18)[0]
    height = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP variant unsupported (bpp={bpp}, comp={compression})")
    bottom_up = height > 0
    h = abs(height)
    stride = (width * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=data_off)
    img = rows.reshape(h, stride)[:, : width * 3].reshape(h, width, 3)
    if bottom_up:
        img = img[::-1]
    return img[:, :, ::-1].copy()  # BGR -> RGB


def py_decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) -> HxWx3 RGB."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated
    # ASCII tokens (comments '#...' allowed), then ONE whitespace byte
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise NotImplementedError(f"PPM maxval {maxval} unsupported")
    img = np.frombuffer(payload, dtype=np.uint8, count=height * width * 3, offset=pos)
    return img.reshape(height, width, 3).copy()


def py_encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def py_decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch (same shape as the archive sniffing in
    sources/archives.py). Codec formats raise NotImplementedError."""
    if payload[:2] == b"BM":
        return py_decode_bmp(payload)
    if payload[:2] == b"P6":
        return py_decode_ppm(payload)
    raise NotImplementedError(
        "codec image formats (JPEG/PNG/...) require a codec library not "
        "present in this container; BMP and P6 PPM decode natively"
    )


def py_resize_nn(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize via index gather (floor mapping)."""
    src_h, src_w = img.shape[:2]
    ys = (np.arange(h) * src_h // h).clip(0, src_h - 1)
    xs = (np.arange(w) * src_w // w).clip(0, src_w - 1)
    return img[ys][:, xs]


def py_ahash(img: np.ndarray) -> str:
    """64-bit average hash: 8x8 nearest-neighbor grayscale downsample
    (integer mean over RGB), bit=1 where the cell EXCEEDS the mean of
    the 64 cells, packed row-major MSB-first, rendered as 16 hex."""
    small = py_resize_nn(img, 8, 8)
    gray = small.astype(np.int64).sum(axis=2) // 3
    bits = (gray > gray.mean()).astype(np.uint8).ravel()
    return np.packbits(bits).tobytes().hex()


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic fake: dims derived from the payload digest. Stands
    in for codec decoders until a codec lib is available."""
    d = hashlib.md5(payload or b"").hexdigest()
    return int(d[:2], 16) + 16, int(d[2:4], 16) + 16, d[:16]


def decode_image_batch(pdf: pd.DataFrame, fake: bool) -> pd.DataFrame:
    rows = []
    for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
        if payload is None:  # NULL payload -> NULL features, not a crash
            rows.append({"media_id": media_id, "width": None, "height": None, "phash": None})
            continue
        raw = bytes(payload)
        if fake:
            w, h, ph = _fake_decode(raw)
        else:
            img = py_decode_image(raw)  # NotImplementedError for codecs
            h, w = img.shape[:2]
            ph = py_ahash(img)
        rows.append({"media_id": media_id, "width": w, "height": h, "phash": ph})
    return pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])


def extract_image_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas over (media_id, payload) Arrow batches. Only the two
    needed columns cross the boundary; binary payloads stream in Arrow
    buffers (no base64 inflation, unlike the reference). fake=True
    routes to the deterministic stand-in (codec formats)."""
    narrow = media.where(F.col("kind") == "image").select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_image_batch(pdf, fake)

    return narrow.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Real resize kernel: decode (BMP/PPM), nearest-neighbor resize,
    re-encode as P6 PPM — (media_id, payload) out, same batch shape."""
    narrow = media.where(F.col("kind") == "image").select("media_id", "payload")
    out_schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("payload", BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                img = py_decode_image(bytes(payload))
                rows.append(
                    {
                        "media_id": media_id,
                        "payload": py_encode_ppm(py_resize_nn(img, width, height)),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return narrow.mapInPandas(run, out_schema)


# --- real audio kernel -------------------------------------------------------


def py_audio_features(payload: bytes) -> dict:
    """WAV (stdlib `wave`) -> rate/channels/duration + RMS and
    zero-crossing rate over 16-bit PCM samples (channel-interleaved;
    metrics over the flattened stream)."""
    with wave.open(io.BytesIO(payload)) as w:
        rate, channels, n = w.getframerate(), w.getnchannels(), w.getnframes()
        if w.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        pcm = np.frombuffer(w.readframes(n), dtype="<i2").astype(np.float64)
    dur = n / rate if rate else 0.0
    if len(pcm) == 0:
        return {"sample_rate": rate, "channels": channels, "duration_s": dur,
                "rms": 0.0, "zero_crossing_rate": 0.0}
    rms = float(np.sqrt(np.mean(pcm**2)))
    zc = float(np.mean(np.signbit(pcm[1:]) != np.signbit(pcm[:-1])))
    return {
        "sample_rate": rate,
        "channels": channels,
        "duration_s": dur,
        "rms": rms,
        "zero_crossing_rate": zc,
    }


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Real WAV feature extraction via one mapInPandas pass."""
    narrow = media.where(F.col("kind") == "audio").select("media_id", "payload")

    null_feats = {
        "sample_rate": None, "channels": None, "duration_s": None,
        "rms": None, "zero_crossing_rate": None,
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AUDIO_FEATURES_SCHEMA.fields]
        for pdf in batches:
            rows = [
                {"media_id": mid,
                 **(null_feats if p is None else py_audio_features(bytes(p)))}
                for mid, p in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=cols)

    return narrow.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


# --- video -------------------------------------------------------------------


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_idx)
    to decode, exploded JVM-side so the decode stage is an even-width
    map over rows (partition-friendly). Frame decode for codec video
    remains the stubbed kernel (no codec lib in this container)."""
    return (
        media.where(F.col("kind") == "video")
        .withColumn("n_frames", (F.octet_length("payload") / 1024).cast("int") + 1)
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
        )
    )
