"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

The Spark-side machinery (schemas, Arrow batch shapes, partition-friendly
mapInPandas UDFs, DFS offload threshold) is real and tested; the actual codec
steps are STUBBED — this container has no image/audio libraries — behind
clearly marked ``NotImplementedError`` raises or deterministic fakes, so the
pipeline shape is verifiable end to end without them.

At 100 TB: blobs ride in their own column, metadata extraction is one narrow
Arrow stage, and anything above ``inline_blob_max_bytes`` should live on DFS
with only the path in the row (same split as the doc cache).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image | audio | video | unknown
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("entropy", DoubleType()),  # byte-level Shannon entropy
    ]
)

_MAGIC = [
    (b"\x89PNG", "image", "image/png"),
    (b"\xff\xd8\xff", "image", "image/jpeg"),
    (b"GIF8", "image", "image/gif"),
    (b"RIFF", "audio", "audio/wav"),
    (b"ID3", "audio", "audio/mpeg"),
    (b"\x1aE\xdf\xa3", "video", "video/webm"),
]


def _meta_of(blob: bytes) -> dict:
    import numpy as np

    media_type, mime = "unknown", "application/octet-stream"
    for magic, mt, mm in _MAGIC:
        if blob.startswith(magic):
            media_type, mime = mt, mm
            break
    counts = np.bincount(np.frombuffer(blob, dtype=np.uint8), minlength=256)
    p = counts[counts > 0] / max(len(blob), 1)
    entropy = float(-(p * np.log2(p)).sum()) if len(blob) else 0.0
    return {
        "media_type": media_type,
        "mime": mime,
        "n_bytes": len(blob),
        "sha256": hashlib.sha256(blob).hexdigest(),
        "entropy": round(entropy, 4),
    }


def extract_media_meta(df: DataFrame, blob_col: str = "media") -> DataFrame:
    """Append a typed ``meta`` struct — REAL byte-level feature extraction
    (magic sniff, size, sha256, entropy); one narrow Arrow stage."""
    out_schema = StructType(
        list(df.schema.fields) + [StructField("meta", MEDIA_META_SCHEMA)]
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            yield pdf.assign(
                meta=[_meta_of(bytes(b) if b is not None else b"") for b in pdf[blob_col]]
            )

    return df.mapInPandas(run, out_schema)


def decode_image(df: DataFrame, blob_col: str = "media") -> DataFrame:
    """STUB — image decoding requires a codec library absent from this
    container. The UDF signature/schema (h, w, c, pixels) is the real
    contract a PIL/opencv-backed implementation drops into."""
    raise NotImplementedError(
        "decode_image: no image codec in this environment; "
        "plug PIL/cv2 into the mapInPandas body with schema "
        "struct<h:int, w:int, c:int, pixels:binary>"
    )


def frame_sample(
    df: DataFrame, blob_col: str = "media", every_n: int = 30
) -> DataFrame:
    """Deterministic FAKE frame sampler (video codec absent): emits one
    'frame' row per ``every_n`` KiB of payload with a sha256 frame id —
    exercises the real 1→N explode shape a true decoder would produce."""
    out_schema = StructType(
        [f for f in df.schema.fields if f.name != blob_col]
        + [
            StructField("frame_idx", IntegerType()),
            StructField("frame_sig", StringType()),
        ]
    )
    keep = [f.name for f in df.schema.fields if f.name != blob_col]
    chunk = every_n * 1024

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        cols = keep + ["frame_idx", "frame_sig"]
        for pdf in batches:
            rows = []
            for row in pdf.to_dict("records"):
                blob = bytes(row.get(blob_col) or b"")
                n_frames = max(1, len(blob) // chunk)
                for i in range(n_frames):
                    piece = blob[i * chunk : (i + 1) * chunk]
                    rows.append(
                        {
                            **{k: row[k] for k in keep},
                            "frame_idx": i,
                            "frame_sig": hashlib.sha256(piece).hexdigest()[:16],
                        }
                    )
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(
                columns=cols
            )

    return df.mapInPandas(run, out_schema)
