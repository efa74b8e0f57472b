"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery is real and tested — schemas, Arrow batch shape,
``mapInPandas`` UDF signatures, partition-preserving transforms. Decoders
are pluggable per media kind (``register_decoder``), and REAL stdlib-only
codecs exist for all three modalities (no PIL/librosa/ffmpeg in this
container, so each parses its format from raw bytes):

* audio — RIFF/WAVE PCM via stdlib ``wave`` (``wav_decoder``): mono-mix,
  float32 normalize, log-RMS energy-envelope feature;
* image — binary PPM/PGM (netpbm P6/P5, 8- and 16-bit maxval) parsed
  from bytes (``ppm_decoder``): luma grid-mean "thumbnail" feature;
* video — YUV4MPEG2 (y4m, C420*/C422/C444/mono) parsed from bytes
  (``y4m_decoder``): evenly-sampled frames, per-frame mean luma +
  temporal-difference energy feature.

The registry DEFAULT per kind stays the deterministic ``_fake_decode``
stub because ``synth_media`` payloads are opaque fake bytes, not encoded
media; pipelines with real payloads opt in via ``register_decoder`` or the
``decoders=`` argument. Real codec and stub share one signature, so
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


# ---------------------------------------------------------------------------
# image: binary netpbm (PPM P6 / PGM P5), stdlib-only byte parsing
# ---------------------------------------------------------------------------


def _pnm_header(payload: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse a binary netpbm header: (magic, width, height, maxval,
    pixel-data offset). Whitespace/comment handling per the netpbm spec —
    '#' comments may appear anywhere between header tokens."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PGM/PPM payload (magic {magic!r})")
    i, n = 2, len(payload)
    vals: list[int] = []
    while len(vals) < 3:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if i < n and payload[i : i + 1] == b"#":
            while i < n and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        vals.append(int(payload[i:j]))
        i = j
    i += 1  # exactly ONE whitespace byte separates maxval from pixel data
    w, h, maxval = vals
    if not (0 < maxval < 65536):
        raise ValueError(f"bad netpbm maxval {maxval}")
    return magic, w, h, maxval, i


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL image decode, stdlib-only: binary PPM (P6, RGB) or PGM (P5,
    grayscale), 8-bit or 16-bit (maxval > 255 ⇒ big-endian 2-byte
    samples, per spec) → float32 H×W×3 in [0, 1] (grayscale replicated
    across channels so downstream sees one shape)."""
    magic, w, h, maxval, off = _pnm_header(payload)
    ch = 3 if magic == b"P6" else 1
    dt = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    count = w * h * ch
    px = np.frombuffer(payload, dtype=dt, count=count, offset=off)
    img = px.astype(np.float32).reshape(h, w, ch) / float(maxval)
    if ch == 1:
        img = np.repeat(img, 3, axis=2)
    return img


def encode_ppm(img: np.ndarray, maxval: int = 255) -> bytes:
    """Inverse for tests/synth: float H×W×3 (or H×W) in [0, 1] → binary
    PPM (P6) / PGM (P5) bytes."""
    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 2:
        magic, ch = b"P5", 1
        flat = a
    elif a.ndim == 3 and a.shape[2] == 3:
        magic, ch = b"P6", 3
        flat = a
    else:
        raise ValueError(f"expected HxW or HxWx3, got shape {a.shape}")
    h, w = flat.shape[0], flat.shape[1]
    q = np.clip(np.round(flat * maxval), 0, maxval)
    pix = q.astype(">u2" if maxval > 255 else "u1").tobytes()
    return magic + f"\n{w} {h}\n{maxval}\n".encode() + pix


def _luma(img: np.ndarray) -> np.ndarray:
    """Rec.601 luma from H×W×3 floats."""
    return img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114


def _block_mean(plane: np.ndarray, gh: int, gw: int) -> np.ndarray:
    """Mean over a gh×gw grid of rectangular cells (a box-filter resize —
    the real "resize" the metadata-only resize_images plans for)."""
    h, w = plane.shape
    re = np.linspace(0, h, gh + 1).astype(np.int64)
    ce = np.linspace(0, w, gw + 1).astype(np.int64)
    out = np.empty((gh, gw), dtype=np.float32)
    for i in range(gh):
        for j in range(gw):
            cell = plane[re[i] : max(re[i + 1], re[i] + 1), ce[j] : max(ce[j + 1], ce[j] + 1)]
            out[i, j] = float(cell.mean())
    return out


def ppm_grid_features(payload: bytes, kind: str, dim: int) -> np.ndarray:
    """REAL image feature: decode, take luma, box-filter down to a g×g
    grid (g = ⌊√dim⌋) of cell means — a deterministic thumbnail that
    captures actual spatial structure (dark/bright regions, gradients);
    remaining slots carry global luma mean/std then zero-pad. Swap in a
    CNN embed behind this same signature when available."""
    y = _luma(decode_ppm(payload))
    g = max(1, int(np.sqrt(dim)))
    feat = _block_mean(y, g, g).ravel()
    extras = np.array([y.mean(), y.std()], dtype=np.float32)
    out = np.concatenate([feat, extras])[:dim]
    if len(out) < dim:
        out = np.pad(out, (0, dim - len(out)))
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# video: YUV4MPEG2 (y4m), stdlib-only byte parsing
# ---------------------------------------------------------------------------


def decode_y4m(payload: bytes) -> tuple[np.ndarray, float]:
    """REAL video decode, stdlib-only: YUV4MPEG2 stream → (float32 luma
    frames T×H×W in [0, 1], fps). Chroma planes (C420*/C422/C444; mono has
    none) are sized per spec and skipped — the luma features below don't
    consume them, and a color-aware decoder can extend this parser."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a y4m payload")
    nl = payload.index(b"\x0A")
    w = h = 0
    fps = 0.0
    colorspace = "420"
    for tok in payload[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            num, den = t[1:].split(":")
            fps = int(num) / int(den)
        elif t[0] == "C":
            colorspace = t[1:]
    if w <= 0 or h <= 0:
        raise ValueError("y4m header missing W/H")
    if colorspace.startswith("420"):
        chroma = 2 * ((w + 1) // 2) * ((h + 1) // 2)
    elif colorspace.startswith("422"):
        chroma = 2 * ((w + 1) // 2) * h
    elif colorspace.startswith("444"):
        chroma = 2 * w * h
    elif colorspace.startswith("mono"):
        chroma = 0
    else:
        raise ValueError(f"unsupported y4m colorspace C{colorspace}")
    ysz = w * h
    frames = []
    i = nl + 1
    n = len(payload)
    while i < n:
        if not payload.startswith(b"FRAME", i):
            raise ValueError(f"expected FRAME marker at byte {i}")
        i = payload.index(b"\x0A", i) + 1  # frame params (if any) end at NL
        if i + ysz > n:
            raise ValueError("truncated y4m frame")
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=ysz, offset=i)
            .reshape(h, w)
            .astype(np.float32)
            / 255.0
        )
        i += ysz + chroma
    if not frames:
        raise ValueError("y4m stream has no frames")
    return np.stack(frames), fps


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """Inverse for tests/synth: float luma T×H×W in [0, 1] → y4m bytes
    (Cmono — no chroma planes to fabricate)."""
    a = np.asarray(frames, dtype=np.float64)
    if a.ndim != 3:
        raise ValueError(f"expected TxHxW, got shape {a.shape}")
    t, h, w = a.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 Cmono\x0A".encode()
    body = b"".join(
        b"FRAME\x0A" + np.clip(np.round(a[i] * 255), 0, 255).astype(np.uint8).tobytes()
        for i in range(t)
    )
    return head + body


def y4m_temporal_features(payload: bytes, kind: str, dim: int) -> np.ndarray:
    """REAL video feature: sample ⌈dim/2⌉ frames evenly across the clip
    (the decode-side twin of the sample_frames plan); first half of the
    vector = mean luma per sampled frame, second half = RMS
    frame-difference energy between consecutive samples (0 for the
    first) — captures both brightness structure and motion."""
    y, _fps = decode_y4m(payload)
    k = max(1, (dim + 1) // 2)
    idx = np.linspace(0, len(y) - 1, k).astype(np.int64)
    sampled = y[idx]
    means = sampled.mean(axis=(1, 2))
    diffs = np.zeros(k, dtype=np.float32)
    if k > 1:
        d = np.diff(sampled, axis=0)
        diffs[1:] = np.sqrt((d * d).mean(axis=(1, 2)))
    out = np.concatenate([means, diffs])[:dim].astype(np.float32)
    if len(out) < dim:
        out = np.pad(out, (0, dim - len(out)))
    return out


_DECODERS: dict[str, Decoder] = {
    "image": _fake_decode,  # default: synth_media payloads aren't PPM —
    "video": _fake_decode,  # register ppm_decoder / y4m_decoder for real
    "audio": _fake_decode,  # payloads; see module docstring
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


def ppm_decoder(payload: bytes, kind: str, dim: int) -> np.ndarray:
    """Registry-shaped wrapper for the real PPM/PGM codec:
    ``register_decoder("image", ppm_decoder)``."""
    return ppm_grid_features(payload, kind, dim)


def y4m_decoder(payload: bytes, kind: str, dim: int) -> np.ndarray:
    """Registry-shaped wrapper for the real y4m codec:
    ``register_decoder("video", y4m_decoder)``."""
    return y4m_temporal_features(payload, kind, dim)


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
