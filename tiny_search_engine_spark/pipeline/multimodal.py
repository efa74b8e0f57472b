"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery is real and tested — schemas, Arrow batch shape,
``mapInPandas`` UDF signatures, partition-preserving transforms; the codec
step itself is STUBBED (no image/audio libs in this container): decode is a
deterministic fake derived from the bytes, clearly marked, swappable for a
real decoder (PIL/librosa/ffmpeg) behind the same signature.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, sample_rate int, n_frames int"
)

FEATURES_SCHEMA = "media_id long, kind string, feat array<float>, feat_dim int"


def synth_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic fake media table from a document table:
    payload = utf-8 bytes (stand-in for encoded media), metadata derived
    from lengths. Exercises the binary-column path without real codecs."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        (F.length(text_col) % 640 + 16).cast("int").alias("width"),
        (F.length(text_col) % 480 + 16).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.length(text_col) % 300 + 1).cast("int").alias("n_frames"),
    )


def _fake_decode(payload: bytes, kind: str, dim: int) -> np.ndarray:
    """STUB decoder: deterministic feature vector from sha256(payload).

    Replace with a real decode+embed (PIL/torchvision, librosa, ffmpeg
    frame-sampling) behind the same signature; everything upstream and
    downstream (batching, schema, partitioning) is production-shaped."""
    h = hashlib.sha256(kind.encode() + b"\x00" + payload).digest()
    rng = np.random.Generator(np.random.PCG64(int.from_bytes(h[:8], "little")))
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction over the binary payload column —
    Arrow-batched; one output row per media row."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(bytes(p), k, dim).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "feat": feats,
                    "feat_dim": np.full(len(pdf), dim, dtype=np.int32),
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(fn, FEATURES_SCHEMA)


def resize_images(df: DataFrame, max_side: int = 224) -> DataFrame:
    """Typed-metadata transform: compute target dims (aspect-preserving);
    the pixel resample itself is the stubbed decode step."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")),
    )
    return df.filter(F.col("kind") == "image").select(
        "media_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_w"),
        F.round(F.col("height") * scale).cast("int").alias("target_h"),
    )


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: explode sampled frame indices
    (decode of each frame = stub)."""
    idxs = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return df.filter(F.col("kind") == "video").select(
        "media_id", F.posexplode(idxs).alias("sample_idx", "frame_idx")
    )
