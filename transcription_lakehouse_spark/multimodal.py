"""Multimodal column support: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas`` kernels.

The decode step itself is STUBBED (image/audio codecs are not installed in
this container): ``decode_fn=None`` uses a deterministic fake decoder so the
Spark-side plumbing — schema, partitioning, UDF signatures, batch shapes —
is real and tested; swapping in PIL/librosa later is a one-argument change.

Design for 100 TB: binary payloads stay columnar in parquet; metadata
predicates (media_type, width, duration) push down so decode only touches
selected rows; ``maxRecordsPerBatch`` bounds per-batch memory for large
blobs; feature extraction emits fixed-size float arrays that feed the
operators/similarity.py ANN path.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "media_table",
    "extract_features",
    "resize_media",
    "sample_frames",
    "fake_decode",
]

# typed metadata + opaque payload — the multimodal column convention
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_sec", DoubleType(), True),
        StructField("codec", StringType(), True),
    ]
)


def media_table(df: DataFrame) -> DataFrame:
    """Validate/coerce a DataFrame into the MEDIA_SCHEMA column set."""
    cols = {f.name for f in MEDIA_SCHEMA.fields}
    missing = cols - set(df.columns)
    if missing:
        raise ValueError(f"media table missing columns: {sorted(missing)}")
    return df.select(*[f.name for f in MEDIA_SCHEMA.fields])


def fake_decode(payload: bytes, dim: int = 32) -> np.ndarray:
    """Deterministic stand-in for a real decoder: sha256-seeded feature
    vector. Replace with a real decode+embed (PIL / torchvision / librosa)
    outside this container."""
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype("float32")
    return v / (np.linalg.norm(v) or 1.0)


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
    dim: int = 32,
) -> DataFrame:
    """Arrow-batched feature extraction: (media_id, media_type, features).

    ``decode_fn=None`` raises NotImplementedError semantics per-row only if
    a real decoder is requested elsewhere; here it falls back to
    :func:`fake_decode` so plumbing is testable in-container.
    """
    fn = decode_fn or fake_decode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fn(p).tolist()[:dim] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        kernel, schema="media_id string, media_type string, features array<float>"
    )


def resize_media(
    media: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Arrow-batched image resize plumbing: (media_id, payload, width,
    height) with payload resized to (target_w, target_h).

    The pixel transform is STUBBED (no codec libs in-container):
    ``resize_fn=None`` raises NotImplementedError per batch — the schema,
    batching and metadata rewrite are the real, tested part; a PIL-backed
    ``resize_fn`` drops in unchanged."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if resize_fn is None:
                raise NotImplementedError(
                    "resize_media: no image codec in this container; pass "
                    "resize_fn=(payload, w, h) -> payload"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        resize_fn(p, target_w, target_h) for p in pdf["payload"]
                    ],
                    "width": target_w,
                    "height": target_h,
                }
            )

    return (
        media.filter(F.col("media_type") == "image")
        .select("media_id", "payload")
        .mapInPandas(
            kernel,
            schema="media_id string, payload binary, width long, height long",
        )
    )


def sample_frames(
    media: DataFrame, every_sec: float = 1.0
) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame timestamp
    (decode stubbed — emits frame offsets; a real decoder would attach the
    frame image bytes). Pure column math, no UDF."""
    frames = media.filter(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor(F.col("duration_sec") / every_sec).cast("long"),
            )
        ).alias("frame_idx"),
    )
    return frames.withColumn("frame_time_sec", F.col("frame_idx") * every_sec)
