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
