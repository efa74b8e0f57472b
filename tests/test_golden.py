"""Golden-model sanity on a hand-checkable corpus (the oracle must itself
be verified before it can anchor engine parity)."""

import math

from tiny_search_engine_spark.config import QueryConfig
from tiny_search_engine_spark.golden.model import GoldenIndex, GoldenQueryEngine
from tiny_search_engine_spark.hashing import term_sign


def _mk():
    ix = GoldenIndex(stopwords=["the"], mode="code")
    ix.add_doc(1, "alpha beta gamma")
    ix.add_doc(2, "alpha alpha delta")
    ix.add_doc(3, "the beta beta beta")
    ix.finalize()
    return ix


def test_idf_total_tf_quirk():
    ix = _mk()
    # 'alpha': appears doc1 x1, doc2 x2 → ttf=3 (NOT df=2); N=3
    s = term_sign("alpha")
    assert ix.inv[s][2] == 3
    assert math.isclose(ix.idf[s], math.log((3 - 3 + 0.5) / (3 + 0.5)))
    # 'beta': doc1 x1, doc3 x3 → ttf=4 > N=3 → the reference's size_t
    # subtraction WRAPS → huge positive idf (math_util.cpp:19-23)
    import numpy as np

    sb = term_sign("beta")
    assert math.isclose(
        ix.idf[sb], math.log((float(np.float32(2**64 - 1)) + 0.5) / 4.5)
    )
    assert ix.idf[sb] > 40


def test_stopword_excluded():
    ix = _mk()
    assert term_sign("the") not in ix.inv


def test_doc_stats_per_occurrence():
    ix = _mk()
    d2 = ix.docs[2]
    ia = ix.idf[term_sign("alpha")]
    idl = ix.idf[term_sign("delta")]
    # vec_module counts 'alpha' twice (per occurrence)
    assert math.isclose(d2.vec_module, math.sqrt(2 * ia * ia + idl * idl))
    assert math.isclose(d2.wei_sum, 2 * ia + idl)
    assert d2.doc_len == len("alpha alpha delta")


def test_avg_doc_len():
    ix = _mk()
    assert math.isclose(
        ix.avg_doc_len,
        (len("alpha beta gamma") + len("alpha alpha delta") + len("the beta beta beta")) / 3,
    )


def test_recall_or_union_and_dup_skip():
    ix = _mk()
    eng = GoldenQueryEngine(ix, cfg=QueryConfig(compat="reference"))
    res = eng.bm25_topk("alpha beta")
    assert {r.doc_sign for r in res} == {1, 2, 3}
    # repeated-token query: dup>1 occurrences skipped, same recall set
    res2 = eng.bm25_topk("alpha alpha beta")
    assert {r.doc_sign for r in res2} == {1, 2, 3}


def test_c4_compat_reference_vs_fixed():
    """A doc first discovered via query term i>0 gets recall_by_syn=True and
    inherits term 0's in-query stats (the argument-order bug)."""
    ix = GoldenIndex(stopwords=[], mode="code")
    ix.add_doc(10, "foo foo foo")  # matches term 0 only
    ix.add_doc(20, "bar baz")  # discovered by term 1 ('bar')
    ix.finalize()

    qc_ref = QueryConfig(compat="reference")
    qc_fix = QueryConfig(compat="fixed")
    # query 'foo foo bar': tf_q(foo)=2, tf_q(bar)=1; doc 20's discovery term
    # is 'bar' (i=2 in token order → first non-dup occurrence i=2? no:
    # tokens are [foo, foo, bar]; i=0 foo dup1 → processed; i=1 foo dup2 →
    # skipped; i=2 bar → discovery of doc 20 with i=2≠0)
    ref = GoldenQueryEngine(ix, cfg=qc_ref)
    fix = GoldenQueryEngine(ix, cfg=qc_fix)

    r_ref = {r.doc_sign: r for r in ref.bm25_topk("foo foo bar")}
    r_fix = {r.doc_sign: r for r in fix.bm25_topk("foo foo bar")}

    assert r_ref[20].recall_by_syn is True  # the bug
    assert r_fix[20].recall_by_syn is False
    # bug: doc 20's 'bar' record inherits tf_q of term 0 ('foo') = 2
    m_ref = list(r_ref[20].matches.values())[0]
    m_fix = list(r_fix[20].matches.values())[0]
    assert m_ref.q_tf == 2
    assert m_fix.q_tf == 1
    # hit_freq = min(tf_q, tf_d): bar appears once in doc 20
    assert m_ref.hit_freq == 1 and m_fix.hit_freq == 1


def test_final_rank_is_vsm():
    ix = _mk()
    eng = GoldenQueryEngine(ix)
    res = eng.search("alpha delta")
    assert res[0].final_score == res[0].vsm
    # doc2 contains both query terms → should rank first by vsm
    assert res[0].doc_sign == 2
