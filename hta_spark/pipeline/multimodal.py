"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing (schemas, batch shapes, mapInPandas signatures,
partitioning) is real and tested.  Image *header* decode (PNG/JPEG/GIF
dimensions + channel count) is real too — pure byte parsing of the
container headers, no codec needed.  Full pixel decode would require an
image codec library (not in this environment): unrecognized formats raise
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic fake (seeded by the payload hash) so the pipeline shape can
be exercised end-to-end.

Scale notes: binary payloads ride in parquet as BINARY columns; metadata
extraction is a mapInPandas pass (Arrow-batched, bounded batch memory via
``maxRecordsPerBatch``), and frame-sampling fans out rows per asset with an
explode, keeping per-task memory at O(batch) not O(asset).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MEDIA_SCHEMA", "attach_binary_metadata", "parse_image_header",
           "decode_image_meta", "parse_wav_header", "decode_audio_meta",
           "sample_frames", "resize_plan", "extract_features"]

MEDIA_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])


def attach_binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap declarative metadata: byte length, md5, magic prefix."""
    p = F.col(payload_col)
    return df.withColumns({
        "payload_len": F.octet_length(p),
        "payload_md5": F.md5(p),
        "magic_hex": F.hex(F.substring(p, 1, 4)),
    })


#: PNG color type -> sample channels (PNG spec, IHDR color byte)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: JPEG SOFn markers carrying frame dimensions
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_image_header(b: bytes) -> tuple[str, int, int, int] | None:
    """(format, width, height, channels) from container headers alone —
    pure byte parsing, no codec library.

    - PNG: 8-byte signature, then the IHDR chunk's big-endian width/height
      and color-type byte;
    - GIF87a/89a: little-endian logical-screen width/height;
    - JPEG: walk the marker segments to the first SOFn frame header
      (big-endian height/width + component count).

    Returns None when the payload is not a recognizable image container.
    """
    if len(b) >= 26 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        return ("png", w, h, _PNG_CHANNELS.get(b[25], 3))
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        return ("gif", int.from_bytes(b[6:8], "little"),
                int.from_bytes(b[8:10], "little"), 3)
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2          # standalone markers have no length field
                continue
            if marker in _JPEG_SOF:
                h = int.from_bytes(b[i + 5:i + 7], "big")
                w = int.from_bytes(b[i + 7:i + 9], "big")
                return ("jpeg", w, h, b[i + 9])
            i += 2 + int.from_bytes(b[i + 2:i + 4], "big")
        return None
    return None


def parse_wav_header(b: bytes) -> tuple[int, int, int, int] | None:
    """(sample_rate, channels, bits_per_sample, n_frames) from a RIFF/WAVE
    header — pure byte parsing (fmt chunk walk), no codec.  ``n_frames`` is
    derived from the data chunk size; -1 when no data chunk is present in
    the provided bytes.  Returns None for non-WAV payloads."""
    if len(b) < 36 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    rate = ch = bits = None
    frames = -1
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        size = int.from_bytes(b[i + 4:i + 8], "little")
        if cid == b"fmt " and i + 24 <= len(b):
            ch = int.from_bytes(b[i + 10:i + 12], "little")
            rate = int.from_bytes(b[i + 12:i + 16], "little")
            bits = int.from_bytes(b[i + 22:i + 24], "little")
        elif cid == b"data" and ch and bits:
            frames = size // max(1, ch * bits // 8)
        i += 8 + size + (size % 2)          # chunks are word-aligned
    if rate is None:
        return None
    return (rate, ch or 0, bits or 0, frames)


def decode_audio_meta(df: DataFrame, payload_col: str = "payload",
                      fake: bool = False) -> DataFrame:
    """Extract (sample_rate, channels, bits_per_sample, n_frames) per audio
    asset via mapInPandas.  WAV (RIFF) headers parse for real; other
    containers raise unless ``fake=True`` (deterministic stub)."""
    out_schema = T.StructType(df.schema.fields + [
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bits_per_sample", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
    ])

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf[payload_col]:
                raw = bytes(payload or b"")
                parsed = parse_wav_header(raw)
                if parsed is not None:
                    rows.append(parsed)
                elif fake:
                    h = hashlib.md5(raw).digest()
                    rows.append((8000 * (1 + h[0] % 6), 1 + h[1] % 2, 16,
                                 len(raw)))
                else:
                    raise NotImplementedError(
                        "payload is not a RIFF/WAVE container; compressed "
                        "audio decode requires a codec library — pass "
                        "fake=True for the deterministic stub")
            pdf = pdf.copy()
            pdf["sample_rate"] = [r[0] for r in rows]
            pdf["channels"] = [r[1] for r in rows]
            pdf["bits_per_sample"] = [r[2] for r in rows]
            pdf["n_frames"] = [r[3] for r in rows]
            yield pdf

    return df.mapInPandas(_decode, schema=out_schema)


def decode_image_meta(df: DataFrame, payload_col: str = "payload",
                      fake: bool = False) -> DataFrame:
    """Extract (img_format, width, height, channels) per image via
    mapInPandas.

    PNG/JPEG/GIF headers are parsed for real (see
    :func:`parse_image_header`).  Payloads that are not a recognizable
    image container raise ``NotImplementedError`` (full decode needs a
    codec library, absent here) unless ``fake=True``, which derives
    deterministic fake dimensions from the payload hash (stable across
    runs/engines) with ``img_format='fake'``."""
    out_schema = T.StructType(df.schema.fields + [
        T.StructField("img_format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
    ])

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = []
            for payload in pdf[payload_col]:
                raw = bytes(payload or b"")
                parsed = parse_image_header(raw)
                if parsed is not None:
                    dims.append(parsed)
                elif fake:
                    h = hashlib.md5(raw).digest()
                    dims.append(("fake", 64 + h[0] % 192, 64 + h[1] % 192, 3))
                else:
                    raise NotImplementedError(
                        "payload is not a PNG/JPEG/GIF container; full "
                        "image decode requires a codec library — pass "
                        "fake=True for the deterministic stub")
            pdf = pdf.copy()
            pdf["img_format"] = [d[0] for d in dims]
            pdf["width"] = [d[1] for d in dims]
            pdf["height"] = [d[2] for d in dims]
            pdf["channels"] = [d[3] for d in dims]
            yield pdf

    return df.mapInPandas(_decode, schema=out_schema)


def resize_plan(df: DataFrame, target_w: int, target_h: int,
                mode: str = "fit") -> DataFrame:
    """Aspect-preserving resize geometry per image — the part of a resize
    that needs no codec, computed declaratively from the REAL header
    dimensions (``decode_image_meta`` output): scale factor, output size,
    letterbox pad offsets, and output buffer bytes.  This is exactly what
    a downstream GPU/codec preprocessing stage consumes; the pixel
    resample itself is codec-gated like full decode.

    ``mode='fit'`` letterboxes inside (target_w, target_h); ``'fill'``
    scales to cover and records the center-crop offsets instead."""
    if mode not in ("fit", "fill"):
        raise ValueError(f"unknown resize mode {mode!r}")
    w, h = F.col("width").cast("double"), F.col("height").cast("double")
    sx, sy = F.lit(target_w) / w, F.lit(target_h) / h
    scale = F.least(sx, sy) if mode == "fit" else F.greatest(sx, sy)
    out_w = F.least(F.round(w * scale).cast("int"), F.lit(target_w))
    out_h = F.least(F.round(h * scale).cast("int"), F.lit(target_h))
    return df.withColumns({
        "scale": F.round(scale, 6),
        "out_w": out_w,
        "out_h": out_h,
        "pad_x": ((F.lit(target_w) - out_w) / 2).cast("int"),
        "pad_y": ((F.lit(target_h) - out_h) / 2).cast("int"),
        "out_bytes": (F.lit(target_w) * F.lit(target_h)
                      * F.col("channels")).cast("long"),
    })


def extract_features(df: DataFrame, dim: int = 16,
                     payload_col: str = "payload",
                     fake: bool = False) -> DataFrame:
    """Per-asset feature vector (``array<float>``, unit-norm) via
    mapInPandas — the embedding-extraction stage of a multimodal pipeline;
    its output feeds the ann/dedup operators directly.

    Real pixel/sample features require a codec (absent here): raises
    unless ``fake=True``, which derives a deterministic unit vector from
    md5 bits of the payload (stable across runs/engines, so the
    downstream similarity plumbing is exercised end-to-end)."""
    out_schema = T.StructType(df.schema.fields + [
        T.StructField("feature", T.ArrayType(T.FloatType()), True)])

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                raw = bytes(payload or b"")
                if not fake:
                    raise NotImplementedError(
                        "pixel/sample feature extraction requires a codec "
                        "library — pass fake=True for the deterministic "
                        "stub")
                need, out = dim * 4, b""
                seed = raw
                while len(out) < need:
                    seed = hashlib.md5(seed).digest()
                    out += seed
                v = np.frombuffer(out[:need], dtype="<u4").astype("float64")
                v = v / 2**32 - 0.5
                v = v / (np.linalg.norm(v) or 1.0)
                feats.append(v.astype("float32").tolist())
            pdf = pdf.copy()
            pdf["feature"] = feats
            yield pdf

    return df.mapInPandas(_extract, schema=out_schema)


def sample_frames(df: DataFrame, n_frames: int = 4,
                  asset_col: str = "asset_id") -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame index
    (decode stubbed — the frame payload is the asset payload slice marker).
    Keeps fan-out declarative (explode), so Spark sizes tasks by frames."""
    idx = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx")
    return df.select(F.col(asset_col), F.col("media_type"), idx) \
             .withColumn("frame_key",
                         F.concat_ws(":", F.col(asset_col).cast("string"),
                                     F.col("frame_idx").cast("string")))
