"""Scaling/partitioning invariance + checkpoint-resume (SURVEY.md §5.4-5.5):
the same input at different partitionings produces byte-identical sorted
postings and identical stats; a build interrupted after a subset of stages
resumes to the same output as a single-shot build."""

import os
import shutil

from pyspark.sql import functions as F

from tiny_search_engine_spark.build import BuildConfig, build_index
from tiny_search_engine_spark.compress import decode_posting
from tiny_search_engine_spark.synth import make_stopwords, source_files

N = 120


def _postings_map(spark, store):
    out = {}
    for r in store.postings(spark).collect():
        d, t, dl = decode_posting(bytes(r["doc_bytes"]), bytes(r["tf_bytes"]), bytes(r["dl_bytes"]))
        out.setdefault(r["term_sign"], []).extend(zip(d.tolist(), t.tolist(), dl.tolist()))
    return {k: sorted(v) for k, v in out.items()}


def _doc_stats(spark, store):
    return {
        r["doc_id"]: (r["doc_len"], r["n_terms"], round(r["vec_module"], 9), round(r["wei_sum"], 9))
        for r in store.docs(spark).collect()
    }


def test_partitioning_invariance(spark, tmp_path):
    cfg = BuildConfig(stopwords=frozenset(make_stopwords()), postings_per_shard=32, block_size=8)
    src = source_files(spark, N, seed=11)
    s1 = build_index(spark, src.repartition(2), str(tmp_path / "a"), cfg)
    s2 = build_index(spark, src.repartition(7), str(tmp_path / "b"), cfg)
    assert _postings_map(spark, s1) == _postings_map(spark, s2)
    assert _doc_stats(spark, s1) == _doc_stats(spark, s2)
    assert s1.meta()["avg_doc_len"] == s2.meta()["avg_doc_len"]


def test_resume_equals_single_shot(spark, tmp_path):
    cfg = BuildConfig(stopwords=frozenset(make_stopwords()), postings_per_shard=32, block_size=8)
    src = source_files(spark, N, seed=12)
    full = build_index(spark, src, str(tmp_path / "full"), cfg)

    # simulate a crash: build, then destroy the postings + docs stages
    crashed = build_index(spark, src, str(tmp_path / "crash"), cfg)
    shutil.rmtree(crashed.postings_path)
    os.remove(os.path.join(crashed.docs_path, "_SUCCESS"))
    resumed = build_index(spark, src, str(tmp_path / "crash"), cfg, resume=True)

    assert _postings_map(spark, resumed) == _postings_map(spark, full)
    assert _doc_stats(spark, resumed) == _doc_stats(spark, full)


def test_resume_skips_completed_stages(spark, tmp_path):
    import time

    cfg = BuildConfig(stopwords=frozenset(make_stopwords()))
    src = source_files(spark, N, seed=13)
    build_index(spark, src, str(tmp_path / "s"), cfg)
    t0 = time.time()
    build_index(spark, src, str(tmp_path / "s"), cfg, resume=True)
    assert time.time() - t0 < 10  # all stages skipped
