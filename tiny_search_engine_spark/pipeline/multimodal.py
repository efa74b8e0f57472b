"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery is real and tested — schemas, Arrow batch shape,
``mapInPandas`` UDF signatures, partition-preserving transforms. Decoders
are pluggable per media kind (``register_decoder``): the default for
image/video is a clearly-marked deterministic STUB (no PIL/ffmpeg in this
container), while **audio is a REAL codec** — stdlib ``wave`` PCM decode
(mono-mix, float32 normalize) + a log-RMS energy-envelope feature, no
external libs. The stub and the real decoder share one signature, so
swapping PIL/librosa/ffmpeg in later touches nothing upstream.
"""

from __future__ import annotations

import hashlib
import io
import wave
from typing import Callable, Iterator

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


# ---------------------------------------------------------------------------
# codec seam: per-kind decoder registry
# ---------------------------------------------------------------------------

# (payload, kind, dim) -> float32[dim] feature vector
Decoder = Callable[[bytes, str, int], np.ndarray]


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL audio decode, stdlib-only: RIFF/WAVE PCM (8/16/32-bit, any
    channel count) → (float32 mono signal in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch, sw, rate, n_frames = (
            w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes(),
        )
        raw = w.readframes(n_frames)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:  # WAV 8-bit is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, rate


def encode_wav(signal: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Inverse for tests/synth: float mono in [-1, 1] → PCM16 WAV bytes."""
    pcm = np.clip(np.asarray(signal, dtype=np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def wav_envelope_features(payload: bytes, kind: str, dim: int) -> np.ndarray:
    """REAL audio feature: log-RMS energy envelope — decode, split the
    signal into ``dim`` equal windows, log1p(RMS) per window. Captures
    actual signal structure (silence vs tone vs ramp) with zero external
    dependencies; swap in librosa mel-spectrograms behind this same
    signature when available."""
    x, _rate = decode_wav(payload)
    if len(x) == 0:
        return np.zeros(dim, dtype=np.float32)
    edges = np.linspace(0, len(x), dim + 1).astype(np.int64)
    out = np.empty(dim, dtype=np.float32)
    for i in range(dim):
        seg = x[edges[i] : edges[i + 1]]
        out[i] = np.log1p(np.sqrt(float((seg * seg).mean()))) if len(seg) else 0.0
    return out


_DECODERS: dict[str, Decoder] = {
    "image": _fake_decode,  # STUB (no PIL in container)
    "video": _fake_decode,  # STUB (no ffmpeg in container)
    "audio": _fake_decode,  # default; register_decoder swaps in WAV below
}


def register_decoder(kind: str, fn: Decoder) -> None:
    """Swap the decoder for a media kind — the seam the stubs sit behind.
    The UDF closure captures the mapping at extract_features call time,
    so registration is session-scoped and executor-safe."""
    _DECODERS[kind] = fn


def wav_decoder(payload: bytes, kind: str, dim: int) -> np.ndarray:
    """Registry-shaped wrapper for the real WAV codec:
    ``register_decoder("audio", wav_decoder)``."""
    return wav_envelope_features(payload, kind, dim)


def extract_features(
    df: DataFrame, dim: int = 16, decoders: dict[str, Decoder] | None = None
) -> DataFrame:
    """mapInPandas feature extraction over the binary payload column —
    Arrow-batched; one output row per media row. Decoder per kind comes
    from ``decoders`` (defaults to the session registry snapshot)."""
    table = dict(_DECODERS)
    if decoders:
        table.update(decoders)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                table.get(k, _fake_decode)(bytes(p), k, dim).tolist()
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
