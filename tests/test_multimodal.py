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
