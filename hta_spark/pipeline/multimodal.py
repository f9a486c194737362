"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing (schemas, batch shapes, mapInPandas signatures,
partitioning) is real and tested; the actual media decode is STUBBED —
image/audio codecs are not available in this environment.  Decoders raise
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic fake (seeded by the payload hash) so the pipeline shape can be
exercised end-to-end.

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

__all__ = ["MEDIA_SCHEMA", "attach_binary_metadata", "decode_image_meta",
           "sample_frames"]

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


def decode_image_meta(df: DataFrame, payload_col: str = "payload",
                      fake: bool = False) -> DataFrame:
    """Extract (width, height, channels) per image via mapInPandas.

    Real decode requires an image codec (not in this container) — STUB:
    raises unless ``fake=True``, which derives deterministic fake dimensions
    from the payload hash (stable across runs/engines)."""
    out_schema = T.StructType(df.schema.fields + [
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
    ])

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires a codec library; pass fake=True "
                    "for the deterministic stub")
            dims = []
            for payload in pdf[payload_col]:
                h = hashlib.md5(bytes(payload or b"")).digest()
                dims.append((64 + h[0] % 192, 64 + h[1] % 192, 3))
            pdf = pdf.copy()
            pdf["width"] = [d[0] for d in dims]
            pdf["height"] = [d[1] for d in dims]
            pdf["channels"] = [d[2] for d in dims]
            yield pdf

    return df.mapInPandas(_decode, schema=out_schema)


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
