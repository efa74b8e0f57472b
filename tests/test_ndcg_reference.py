"""The reference's one published metric, computed by the engine: NDCG@3
over /root/reference/index/url.list.utf8 (README.md:50-57). Pins the
numbers recorded in BASELINE.md ("Engine NDCG@3" table) — deterministic:
fixed corpus, deterministic tokenizer/wordlist, pinned tiebreaks.

The full 4-row replication lives in scripts/ndcg_reference.py; this test
pins the two rows computable from one store build (stopword variants of
the vsm and coverage scorers) to keep suite runtime bounded."""

import os

import pytest

from tiny_search_engine_spark import reference_eval as re_

pytestmark = pytest.mark.skipif(
    not os.path.exists(re_.REF_CORPUS), reason="reference corpus absent"
)


@pytest.fixture(scope="module")
def ref_store(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("refeval") / "store_stop")
    return re_.build_reference_store(spark, out, use_stopwords=True)


def test_reference_corpus_shape(spark):
    qs = re_.reference_queries(spark)
    assert len(qs) == 500
    labels = re_.reference_labels(spark, qs)
    assert labels.count() == 5006
    # scorable = queries with at least one positively-labeled doc
    assert labels.filter("label > 0").select("query_id").distinct().count() == 487


def test_engine_ndcg3_pinned(spark, ref_store):
    """BASELINE.md rows v0.6 (vsm+stop: engine 73.56 vs published 73.89)
    and v0.3 (cqr*ctr+stop: engine 74.95 vs published 73.58)."""
    qs = re_.reference_queries(spark)
    labels = re_.reference_labels(spark, qs).cache()
    try:
        m_vsm, n_vsm = re_.engine_ndcg3(spark, ref_store, qs, labels, ranker="vsm")
        m_cov, n_cov = re_.engine_ndcg3(spark, ref_store, qs, labels, ranker="coverage")
    finally:
        labels.unpersist()
    assert n_vsm == n_cov == 487
    # score ties are pervasive on this corpus (duplicate Baidu result
    # titles share exact scores), so fp-lsb differences in the
    # distributed norm accumulation break ties differently per build
    # partition layout (shuffle partitions, AQE coalescing, session
    # history). Observed spread: vsm 73.56-73.58, coverage 74.85-74.95.
    # Pin each as its observed band — the metric, not its tie noise.
    assert 73.4 < m_vsm < 73.8, m_vsm
    assert 74.6 < m_cov < 75.2, m_cov
    # both within the published table's envelope (72.08 .. 77.94 ± noise)
    for m in (m_vsm, m_cov):
        assert 70.0 < m < 80.0


def test_engine_ndcg3_ltr_rerank(spark, ref_store):
    """The unpublished '#ifdef XGBOOST on' row (BASELINE.md: 71.95):
    shipped-model LTR rerank of engine features. Pinned as a band — the
    model's input distribution is segmentation-shifted (cilin vs the
    missing jieba dicts), so the defensible claims are (a) it runs end
    to end over the full corpus and (b) it lands inside the published
    table's envelope, below the hand scorers it was meant to beat."""
    if not os.path.exists(os.path.join(re_.REF_DIR, "dict", "xgb.ltr.model")):
        pytest.skip("reference model absent")
    qs = re_.reference_queries(spark)
    labels = re_.reference_labels(spark, qs).cache()
    try:
        m, n = re_.engine_ndcg3_ltr(spark, ref_store, qs, labels)
    finally:
        labels.unpersist()
    assert n == 487
    assert 70.0 < m < 74.0, m  # measured 71.95; band for fp-tie drift


def test_engine_ndcg3_mp_granularity_negative_result(spark, tmp_path_factory):
    """Round-5 granularity experiment (BASELINE.md): MP-style
    longest-match segmentation (no sub-word enrichment) does NOT recover
    the published +4.36 v0.7 synonym gain — the synonym delta stays
    slightly negative (measured 74.64 -> 74.31, delta -0.33). Pinned as
    bands so the recorded negative result stays a fact about the code,
    not a one-off run."""
    out = str(tmp_path_factory.mktemp("refeval_mp") / "store_mp")
    store = re_.build_reference_store(spark, out, use_stopwords=True, seg_mode="mp")
    qs = re_.reference_queries(spark)
    labels = re_.reference_labels(spark, qs).cache()
    try:
        m_base, n1 = re_.engine_ndcg3(
            spark, store, qs, labels, ranker="coverage", use_synonyms=False
        )
        m_syn, n2 = re_.engine_ndcg3(
            spark, store, qs, labels, ranker="coverage", use_synonyms=True
        )
    finally:
        labels.unpersist()
    assert n1 == n2 == 487
    assert 74.3 < m_base < 75.0, m_base  # measured 74.64; fp-tie band
    assert 74.0 < m_syn < 74.7, m_syn    # measured 74.31
    # the experiment's conclusion: no synonym gain at MP granularity
    assert m_syn - m_base < 1.0, (m_base, m_syn)
