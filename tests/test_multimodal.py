"""Multimodal binary-column plumbing: schema, Arrow batch shape, UDF
signatures are real; the decode is a deterministic stub (no codec libs in
this container — see pipeline/multimodal.py)."""

import pytest
from pyspark.sql import functions as F

from tiny_search_engine_spark.pipeline import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"payload text {i} " * (i + 1)) for i in range(9)],
        "doc_id long, text string",
    )
    return multimodal.synth_media(docs)


def test_media_schema(media):
    assert media.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,payload:binary,mime:string,"
        "width:int,height:int,sample_rate:int,n_frames:int>"
    )
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_deterministic(media):
    f1 = {r["media_id"]: r["feat"] for r in multimodal.extract_features(media, dim=8).collect()}
    f2 = {r["media_id"]: r["feat"] for r in multimodal.extract_features(media, dim=8).collect()}
    assert f1 == f2
    assert all(len(v) == 8 for v in f1.values())


def test_resize_targets(media):
    out = multimodal.resize_images(media, max_side=32).collect()
    assert len(out) > 0
    for r in out:
        assert max(r["target_w"], r["target_h"]) <= 32
        # aspect preserved within rounding
        assert abs(r["target_w"] / r["target_h"] - r["width"] / r["height"]) < 0.2


def test_frame_sampling(media):
    out = multimodal.sample_frames(media, every_n=5).collect()
    assert len(out) > 0
    for r in out:
        assert r["frame_idx"] % 5 == 0


def test_features_feed_knn(spark, media):
    """Composability: extracted media features are first-class embeddings —
    they feed the similarity-search operators unchanged (self is top-1)."""
    from tiny_search_engine_spark.pipeline import simsearch

    feats = multimodal.extract_features(media, dim=8).select(
        F.col("media_id").alias("vec_id"), F.col("feat").alias("embedding")
    )
    q = feats.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_vec_id"), "embedding"
    )
    by_q = {}
    for r in simsearch.knn_cosine(feats, q, k=3).collect():
        by_q.setdefault(r["query_vec_id"], []).append(r)
    assert set(by_q) == {0, 1}
    for qid, rs in by_q.items():
        best = [r for r in rs if r["rank"] == 1][0]
        assert best["vec_id"] == qid and abs(best["cosine"] - 1.0) < 1e-6


# ---------------------------------------------------------------------------
# REAL codec: stdlib WAV decode + energy-envelope features (no stub)
# ---------------------------------------------------------------------------


def _tone(freq, secs=0.25, rate=8000, amp=0.5):
    import numpy as np

    t = np.arange(int(secs * rate)) / rate
    return amp * np.sin(2 * np.pi * freq * t), rate


def test_wav_roundtrip_pcm16():
    import numpy as np

    sig, rate = _tone(440)
    payload = multimodal.encode_wav(sig, rate)
    back, brate = multimodal.decode_wav(payload)
    assert brate == rate
    assert back.dtype == np.float32 and len(back) == len(sig)
    assert float(np.abs(back - sig.astype(np.float32)).max()) < 1e-3  # PCM16 quant


def test_wav_decode_stereo_and_8bit():
    import io
    import wave

    import numpy as np

    # stereo PCM16: decode must mono-mix
    l = (np.ones(100) * 0.5 * 32767).astype("<i2")
    r = (np.zeros(100)).astype("<i2")
    inter = np.empty(200, dtype="<i2")
    inter[0::2], inter[1::2] = l, r
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2); w.setsampwidth(2); w.setframerate(8000)
        w.writeframes(inter.tobytes())
    x, rate = multimodal.decode_wav(buf.getvalue())
    assert rate == 8000 and len(x) == 100
    assert abs(float(x.mean()) - 0.25) < 1e-3  # (0.5 + 0.0) / 2

    # 8-bit unsigned: value 128 is silence
    buf8 = io.BytesIO()
    with wave.open(buf8, "wb") as w:
        w.setnchannels(1); w.setsampwidth(1); w.setframerate(8000)
        w.writeframes(bytes([128] * 50))
    x8, _ = multimodal.decode_wav(buf8.getvalue())
    assert float(abs(x8).max()) == 0.0


def test_wav_envelope_captures_signal_structure():
    import numpy as np

    rate = 8000
    # ramp: quiet first half, loud second half -> rising envelope
    n = rate // 2
    ramp = np.concatenate([0.02 * np.ones(n // 2), 0.8 * np.ones(n // 2)])
    ramp = ramp * np.sin(2 * np.pi * 300 * np.arange(n) / rate)
    env = multimodal.wav_envelope_features(multimodal.encode_wav(ramp, rate), "audio", 8)
    assert env[:4].max() < env[4:].min()  # envelope follows the amplitude
    # silence -> (near-)zero everywhere
    silent = multimodal.wav_envelope_features(
        multimodal.encode_wav(np.zeros(n), rate), "audio", 8
    )
    assert float(abs(silent).max()) < 1e-6


def test_codec_seam_swap_changes_features(spark):
    """The seam the stubs sit behind: the SAME extract_features call with
    the real WAV decoder registered must (a) produce the driver-side
    wav_envelope_features bit-exactly and (b) differ from the fake-decode
    run — proving the swap reaches the executors."""
    import numpy as np

    rows = []
    for i in range(6):
        sig, rate = _tone(200 + 100 * i, amp=0.1 + 0.1 * i)
        rows.append(
            (i, "audio", bytearray(multimodal.encode_wav(sig, rate)), "audio/wav",
             0, 0, rate, 0)
        )
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)

    fake = {r["media_id"]: r["feat"] for r in multimodal.extract_features(media, dim=8).collect()}
    real = {
        r["media_id"]: r["feat"]
        for r in multimodal.extract_features(
            media, dim=8, decoders={"audio": multimodal.wav_decoder}
        ).collect()
    }
    assert fake.keys() == real.keys() and fake != real
    for i, _, payload, *_ in rows:
        want = multimodal.wav_envelope_features(bytes(payload), "audio", 8)
        assert np.allclose(np.array(real[i], dtype=np.float32), want, atol=0), i

    # global registration path reaches the same decoder
    multimodal.register_decoder("audio", multimodal.wav_decoder)
    try:
        reg = {r["media_id"]: r["feat"] for r in multimodal.extract_features(media, dim=8).collect()}
        assert reg == real
    finally:
        multimodal.register_decoder("audio", multimodal._fake_decode)


# ---------------------------------------------------------------------------
# REAL codec: stdlib PPM/PGM image decode + luma-grid features (no stub)
# ---------------------------------------------------------------------------


def _checker(h=12, w=16):
    import numpy as np

    img = np.zeros((h, w, 3), dtype=np.float64)
    img[:, w // 2 :, :] = 1.0  # dark left half, bright right half
    return img


def test_ppm_roundtrip_8bit_and_16bit():
    import numpy as np

    rng = np.random.default_rng(7)
    img = rng.random((9, 11, 3))
    for maxval, tol in ((255, 1 / 255 + 1e-6), (65535, 1 / 65535 + 1e-6)):
        back = multimodal.decode_ppm(multimodal.encode_ppm(img, maxval=maxval))
        assert back.shape == (9, 11, 3) and back.dtype == np.float32
        assert float(np.abs(back - img).max()) <= tol


def test_pgm_grayscale_and_comments():
    import numpy as np

    gray = np.linspace(0, 1, 6 * 4).reshape(6, 4)
    payload = multimodal.encode_ppm(gray)
    assert payload.startswith(b"P5")
    back = multimodal.decode_ppm(payload)
    assert back.shape == (6, 4, 3)
    assert np.allclose(back[..., 0], back[..., 1])  # replicated channels
    # header comments are legal anywhere between tokens (netpbm spec)
    commented = b"P5\n# a comment\n4 # inline\n6\n255\n" + bytes(
        multimodal.encode_ppm(gray)[len(b"P5\n4 6\n255\n") :]
    )
    assert multimodal.decode_ppm(commented).shape == (6, 4, 3)


def test_ppm_grid_features_capture_structure():
    import numpy as np

    feat = multimodal.ppm_grid_features(
        multimodal.encode_ppm(_checker()), "image", 9
    )
    g = feat[:9].reshape(3, 3)
    assert float(g[:, 0].max()) < 0.1 and float(g[:, 2].min()) > 0.9
    # uniform image -> flat grid
    flat = multimodal.ppm_grid_features(
        multimodal.encode_ppm(np.full((8, 8, 3), 0.5)), "image", 9
    )
    assert float(np.ptp(flat[:9])) < 1 / 255 + 1e-6


# ---------------------------------------------------------------------------
# REAL codec: stdlib y4m video decode + temporal features (no stub)
# ---------------------------------------------------------------------------


def _clip(t=6, h=8, w=8):
    """Luma clip whose brightness ramps up over time."""
    import numpy as np

    return np.stack([np.full((h, w), i / (t - 1)) for i in range(t)])


def test_y4m_roundtrip_mono():
    import numpy as np

    frames = _clip()
    back, fps = multimodal.decode_y4m(multimodal.encode_y4m(frames, fps=30))
    assert fps == 30.0
    assert back.shape == frames.shape and back.dtype == np.float32
    assert float(np.abs(back - frames).max()) <= 1 / 255 + 1e-6


def test_y4m_420_chroma_planes_are_skipped():
    import numpy as np

    # hand-build a C420 stream: luma plane + U/V quarter planes per frame
    w, h = 4, 4
    head = b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420jpeg\x0A"
    f0 = bytes([0] * (w * h)) + bytes([128] * (2 * (w // 2) * (h // 2)))
    f1 = bytes([255] * (w * h)) + bytes([128] * (2 * (w // 2) * (h // 2)))
    y, fps = multimodal.decode_y4m(head + b"FRAME\x0A" + f0 + b"FRAME\x0A" + f1)
    assert fps == 25.0 and y.shape == (2, 4, 4)
    assert float(y[0].max()) == 0.0 and float(y[1].min()) == 1.0


def test_y4m_temporal_features_capture_motion():
    import numpy as np

    moving = multimodal.y4m_temporal_features(
        multimodal.encode_y4m(_clip()), "video", 8
    )
    static = multimodal.y4m_temporal_features(
        multimodal.encode_y4m(np.full((6, 8, 8), 0.5)), "video", 8
    )
    k = (8 + 1) // 2
    assert float(moving[:k].max()) > float(moving[:k].min())  # brightness ramp
    assert float(moving[k + 1 : 2 * k].min()) > 0.0  # motion energy present
    assert float(np.abs(static[k:]).max()) < 1 / 255 + 1e-6  # no motion


def test_all_three_real_codecs_through_spark_seam(spark):
    """image/audio/video rows with REAL encoded payloads through ONE
    extract_features call with all three real decoders registered —
    executor output must equal the driver-side feature functions."""
    import numpy as np

    sig, rate = _tone(330)
    rows = [
        (0, "image", bytearray(multimodal.encode_ppm(_checker())), "image/x-portable-pixmap", 16, 12, 0, 1),
        (1, "audio", bytearray(multimodal.encode_wav(sig, rate)), "audio/wav", 0, 0, rate, 0),
        (2, "video", bytearray(multimodal.encode_y4m(_clip(), fps=30)), "video/x-yuv4mpeg", 8, 8, 0, 6),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    real = {
        r["media_id"]: np.array(r["feat"], dtype=np.float32)
        for r in multimodal.extract_features(
            media,
            dim=8,
            decoders={
                "image": multimodal.ppm_decoder,
                "audio": multimodal.wav_decoder,
                "video": multimodal.y4m_decoder,
            },
        ).collect()
    }
    want = {
        0: multimodal.ppm_grid_features(bytes(rows[0][2]), "image", 8),
        1: multimodal.wav_envelope_features(bytes(rows[1][2]), "audio", 8),
        2: multimodal.y4m_temporal_features(bytes(rows[2][2]), "video", 8),
    }
    for mid, w in want.items():
        assert np.allclose(real[mid], w, atol=0), mid
