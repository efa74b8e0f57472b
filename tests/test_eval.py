"""NDCG@k eval harness (eval.py) + the ranker switch + D11 feature-map
export from search() — the reference's README quality methodology
(NDCG@3 over a labeled query set) made first-class."""

import math

import pytest

from tiny_search_engine_spark import eval as ev
from tiny_search_engine_spark.config import QueryConfig
from tiny_search_engine_spark.features import export_feature_map
from tiny_search_engine_spark.golden.model import GoldenQueryEngine
from tiny_search_engine_spark.query import QueryEngine
from tiny_search_engine_spark.synth import make_queries

QUERIES = [(i, q) for i, q in enumerate(make_queries(12, seed=42))]


def _py_ndcg(ranked, labels, k=3):
    """Straightforward pure-Python NDCG@k: ranked = {qid: [doc...]},
    labels = {(qid, doc): label} over the FULL label universe."""
    out = {}
    by_q = {}
    for (qid, doc), lab in labels.items():
        by_q.setdefault(qid, []).append((lab, doc))
    for qid, docs in ranked.items():
        dcg = sum(
            (2.0 ** labels.get((qid, d), 0) - 1) / math.log2(r + 2)
            for r, d in enumerate(docs[:k])
        )
        ideal = sorted(by_q.get(qid, []), key=lambda t: (-t[0], t[1]))[:k]
        idcg = sum((2.0 ** lab - 1) / math.log2(r + 2) for r, (lab, _) in enumerate(ideal))
        out[qid] = dcg / idcg if idcg > 0 else 0.0
    return out


def test_vectorized_dp_kernels_match_golden():
    """features.py's numpy row-DP LCS/LCSubstr/edit-distance must equal
    the golden model's loop-faithful pure-Python kernels on randomized
    int and byte sequences (incl. empties and the LCSubstr -1 quirk)."""
    import random

    from tiny_search_engine_spark import features as Fe
    from tiny_search_engine_spark.golden import model as G

    rng = random.Random(11)
    for _ in range(400):
        la, lb = rng.randrange(0, 12), rng.randrange(0, 40)
        alpha = rng.randrange(2, 6)
        a = [rng.randrange(alpha) for _ in range(la)]
        b = [rng.randrange(alpha) for _ in range(lb)]
        if rng.random() < 0.3:
            a, b = bytes(a), bytes(b)
        assert Fe._lcs(a, b) == G._lcs(a, b), (a, b)
        assert Fe._lcsubstr(a, b) == G._lcsubstr(a, b), (a, b)
        assert Fe._edit_distance(a, b) == G._edit_distance(a, b), (a, b)


def test_ndcg_hand_crafted(spark):
    ranked = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 11), (0, 3, 12), (1, 1, 10), (1, 2, 13)],
        "query_id long, rank int, doc_id long",
    )
    labels = spark.createDataFrame(
        [(0, 10, 3), (0, 11, 0), (0, 12, 1), (0, 99, 2), (1, 13, 2), (1, 10, 0)],
        "query_id long, doc_id long, label int",
    )
    got = {r["query_id"]: r["ndcg"] for r in ev.ndcg_at_k(ranked, labels, k=3).collect()}
    want = _py_ndcg(
        {0: [10, 11, 12], 1: [10, 13]},
        {(0, 10): 3, (0, 11): 0, (0, 12): 1, (0, 99): 2, (1, 13): 2, (1, 10): 0},
    )
    assert got.keys() == want.keys()
    for q in got:
        assert got[q] == pytest.approx(want[q], abs=1e-12), q
    # q0: perfect first hit but misses labeled doc 99 -> ndcg strictly < 1
    assert 0 < got[0] < 1


def test_ndcg_no_positive_labels_is_zero(spark):
    ranked = spark.createDataFrame([(0, 1, 10)], "query_id long, rank int, doc_id long")
    labels = spark.createDataFrame([(0, 10, 0)], "query_id long, doc_id long, label int")
    assert ev.ndcg_at_k(ranked, labels, k=3).collect()[0]["ndcg"] == 0.0


@pytest.fixture(scope="module")
def labeled(tiny_golden):
    """Synthetic graded labels: derived deterministically from the golden
    bm25 ranking under the STANDARD profile, so the two scorer profiles
    under test are evaluated against the same ground truth."""
    g = GoldenQueryEngine(tiny_golden, cfg=QueryConfig(profile="standard", compat="fixed"))
    labels = {}
    for qid, q in QUERIES:
        for r, res in enumerate(g.bm25_topk(q, k=10)):
            labels[(qid, res.doc_sign)] = 3 if r == 0 else (2 if r < 3 else 1)
    return labels


def _engine_ndcg(spark, tiny_store, ranker, labeled):
    cfg = QueryConfig(profile="standard", compat="fixed", ranker=ranker)
    eng = QueryEngine(spark, tiny_store, cfg)
    ranked_df = eng.search(QUERIES, k=10)
    labels_df = spark.createDataFrame(
        [(q, d, l) for (q, d), l in labeled.items()],
        "query_id long, doc_id long, label int",
    )
    ndcg_df = ev.ndcg_at_k(ranked_df, labels_df, k=3)
    got = {r["query_id"]: r["ndcg"] for r in ndcg_df.collect()}
    # pure-Python cross-check on the same ranking
    ranked_py = {}
    for r in ranked_df.collect():
        ranked_py.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    ranked_py = {q: [d for _, d in sorted(v)] for q, v in ranked_py.items()}
    want = _py_ndcg(ranked_py, labeled)
    for q in got:
        assert got[q] == pytest.approx(want[q], abs=1e-9), q
    mean = ev.mean_ndcg_at_k(ranked_df, labels_df, k=3)
    assert mean == pytest.approx(
        sum(want[q] for q in got) / len(got), abs=1e-9
    )
    return mean


def test_ndcg_vsm_vs_coverage_profiles(spark, tiny_store, labeled):
    """The reference compares scorer versions by NDCG@3 (README.md:50-57:
    V0.1 cqr·ctr = 72.08 vs v0.6 vsm = 73.89). Same comparison here on the
    synthetic labeled set; both must be valid scores, and since labels are
    bm25-derived, the bm25 ranker must score (near-)perfect."""
    m_vsm = _engine_ndcg(spark, tiny_store, "vsm", labeled)
    m_cov = _engine_ndcg(spark, tiny_store, "coverage", labeled)
    m_bm25 = _engine_ndcg(spark, tiny_store, "bm25", labeled)
    for m in (m_vsm, m_cov, m_bm25):
        assert 0.0 < m <= 1.0
    assert m_bm25 == pytest.approx(1.0, abs=1e-9)
    # the two non-bm25 scorers are genuinely different rankings
    assert m_vsm != m_cov


@pytest.mark.parametrize("compat", ["fixed", "reference"])
def test_coverage_ranker_parity_with_golden(spark, tiny_store, tiny_golden, compat):
    """compat='reference' is the QueryConfig default; the coverage ranker
    computes the full feature map (need_full) whose compat_ref branch
    reads the is_disc/disc_i donor fields — search() must ship them in
    the match structs even when emit_features is off (regression: they
    were gated on emit_features alone and ranker='coverage' with default
    compat KeyError'd inside the applyInPandas kernel)."""
    cfg = QueryConfig(profile="standard", compat=compat, ranker="coverage")
    eng = QueryEngine(spark, tiny_store, cfg)
    g = GoldenQueryEngine(tiny_golden, cfg=cfg)
    got = {}
    for r in eng.search(QUERIES, k=10).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["final_score"])
        )
    for qid, q in QUERIES:
        want = [(r.doc_sign, r.final_score) for r in g.search(q, k=10)]
        have = [(d, s) for _, d, s in sorted(got.get(qid, []))]
        assert len(have) == len(want), f"q{qid}"
        for (hd, hs), (wd, ws) in zip(have, want):
            assert hd == wd and hs == pytest.approx(ws, abs=1e-9), f"q{qid}"


@pytest.mark.parametrize(
    "use_syn,compat",
    [(False, "fixed"), (True, "fixed"), (True, "reference")],
    ids=["nosyn-fixed", "syn-fixed", "syn-reference"],
)
def test_search_emit_features_matches_golden(
    spark, tiny_store, tiny_golden, synonyms, use_syn, compat
):
    """D11 export surfaced from the pipeline: the features map emitted by
    search(emit_features=True) equals the golden model's FeatureMgr dump
    (both 3-significant-digit rounded) for every returned (query, doc).

    Parameterized over a synonym dict: a synonym match's D8 q_offsets
    inherit the ORIGINAL query term's offsets under fixed semantics
    (golden fill_match in_q_idx_term, table.cpp:450-455) and the
    arg-order-bug donors (term 0 / term 1) under compat=reference."""
    syn = synonyms if use_syn else None
    cfg = QueryConfig(profile="standard", compat=compat, emit_features=True)
    eng = QueryEngine(spark, tiny_store, cfg, synonyms=syn)
    rows = eng.search(QUERIES[:6], k=5).collect()
    assert rows and "features" in rows[0].asDict()
    g = GoldenQueryEngine(
        tiny_golden, synonyms=syn, cfg=QueryConfig(profile="standard", compat=compat)
    )
    golden_maps = {}
    for qid, q in QUERIES[:6]:
        for r in g.search(q, k=None):
            golden_maps[(qid, r.doc_sign)] = export_feature_map(r.features)
    checked = 0
    for row in rows:
        key = (row["query_id"], row["doc_id"])
        fm = dict(row["features"])
        if not fm:  # funnel-overflow rows carry an empty map
            continue
        assert key in golden_maps, key
        want = golden_maps[key]
        assert fm.keys() == want.keys(), key
        for name in fm:
            assert fm[name] == pytest.approx(want[name], rel=1e-9), (key, name)
        checked += 1
    assert checked >= 10


def test_mrr_recall_hand_crafted(spark):
    # ranking for two queries; labels: relevant = label >= 1
    ranked = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 11), (1, 3, 12),   # q1: relevant at rank 2 and 3
         (2, 1, 20), (2, 2, 21)],              # q2: nothing relevant retrieved
        "query_id long, rank long, doc_id long",
    )
    labels = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2), (1, 99, 3),   # 3 relevant total, 2 retrieved
         (2, 77, 1)],                          # 1 relevant, not retrieved
        "query_id long, doc_id long, label long",
    )
    mrr = {r.query_id: r.mrr for r in ev.mrr_at_k(ranked, labels, k=3).collect()}
    assert mrr == {1: 0.5, 2: 0.0}
    rec = {r.query_id: r.recall for r in ev.recall_at_k(ranked, labels, k=3).collect()}
    assert rec[1] == pytest.approx(2 / 3) and rec[2] == 0.0
    # min_label raises the relevance bar: only doc 12 and 99 count for q1
    mrr2 = {r.query_id: r.mrr for r in ev.mrr_at_k(ranked, labels, k=3, min_label=2).collect()}
    assert mrr2 == {1: 1 / 3, 2: 0.0}
    # k cuts the window: at k=1 nothing relevant is inside it
    mrr1 = {r.query_id: r.mrr for r in ev.mrr_at_k(ranked, labels, k=1).collect()}
    assert mrr1 == {1: 0.0, 2: 0.0}


def test_rbo_at_k_brute(spark):
    from tiny_search_engine_spark.eval import rbo_at_k

    def mk(rows):
        return spark.createDataFrame(rows, "query_id long, rank int, doc_id long")

    a = mk([(0, 1, 10), (0, 2, 11), (0, 3, 12),
            (1, 1, 20), (1, 2, 21),
            (2, 1, 30), (2, 2, 31)])
    b_same = mk([(0, 1, 10), (0, 2, 11), (0, 3, 12),
                 (1, 1, 20), (1, 2, 21)])
    b_disjoint = mk([(2, 1, 90), (2, 2, 91)])

    def brute(ra, rb, k, p):
        import itertools

        out = 0.0
        for d in range(1, k + 1):
            ad = {doc for doc, r in ra.items() if r <= d}
            bd = {doc for doc, r in rb.items() if r <= d}
            out += (1 - p) * p ** (d - 1) * len(ad & bd) / d
        return round(out, 6)

    # identical prefixes: rbo == Σ weights (≈ 1 as k→∞, < 1 truncated)
    got = {r["query_id"]: r["rbo"] for r in rbo_at_k(a, b_same, k=3, p=0.5).collect()}
    assert got[0] == brute({10: 1, 11: 2, 12: 3}, {10: 1, 11: 2, 12: 3}, 3, 0.5)
    assert got[1] == brute({20: 1, 21: 2}, {20: 1, 21: 2}, 3, 0.5)
    assert got[2] == 0.0  # query 2 absent from b_same
    # disjoint lists: exact 0; queries only in run_a still emitted
    got2 = {r["query_id"]: r["rbo"] for r in rbo_at_k(a, b_disjoint, k=3, p=0.5).collect()}
    assert got2 == {0: 0.0, 1: 0.0, 2: 0.0}
    # partial overlap with a rank swap scores below identical
    b_swap = mk([(0, 1, 11), (0, 2, 10), (0, 3, 12)])
    swap = {r["query_id"]: r["rbo"] for r in rbo_at_k(a, b_swap, k=3, p=0.5).collect()}
    assert swap[0] == brute({10: 1, 11: 2, 12: 3}, {11: 1, 10: 2, 12: 3}, 3, 0.5)
    assert 0 < swap[0] < got[0]
    import pytest as _pt

    with _pt.raises(ValueError):
        rbo_at_k(a, b_same, k=0)
    with _pt.raises(ValueError):
        rbo_at_k(a, b_same, p=1.0)
