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
