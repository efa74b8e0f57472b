"""Multinomial Naive Bayes train+classify: pure-Python twin parity plus
behavioral pins (DuckDB-oracle equivalence runs in check_oracles.py)."""

import math
from collections import Counter

import pytest

from tiny_search_engine_spark.pipeline import classify

ROWS = [
    (1, "spark shuffle join spark", "eng"),
    (2, "spark partition scan", "eng"),
    (3, "goal match striker", "sport"),
    (4, "match win striker goal goal", "sport"),
    (5, "spark goal spark", "eng"),  # mixed vocabulary, eng-leaning
]


def _nb_py(rows, alpha=1.0):
    """Pure-python multinomial NB twin; returns {doc_id: (label, score)}."""
    cnt, tot, ndoc = Counter(), Counter(), Counter()
    for _, t, lab in rows:
        ndoc[lab] += 1
        for w in t.lower().split():
            cnt[(lab, w)] += 1
            tot[lab] += 1
    vocab = {w for (_, w) in cnt}
    v, n = len(vocab), len(rows)
    out = {}
    for i, t, _ in rows:
        best = None
        for lab in sorted(ndoc):  # label asc = tie-break order
            s = math.log(ndoc[lab] / n) + sum(
                math.log((cnt[(lab, w)] + alpha) / (tot[lab] + alpha * v))
                for w in t.lower().split()
                if w in vocab
            )
            if best is None or round(s, 6) > best[1]:
                best = (lab, round(s, 6))
        out[i] = best
    return out


def test_nb_classify_brute(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string, source string")
    model = classify.nb_train(df, alpha=1.0)
    got = {r["doc_id"]: r for r in classify.nb_classify(df, model).collect()}
    want = _nb_py(ROWS, alpha=1.0)
    assert set(got) == set(want)
    for i, (lab, score) in want.items():
        assert got[i]["pred_label"] == lab, i
        assert got[i]["log_score"] == pytest.approx(score, abs=2e-6)
    # the separable docs classify to their own labels
    assert got[1]["pred_label"] == "eng" and got[3]["pred_label"] == "sport"


def test_nb_classify_oov_and_empty_fall_back_to_prior(spark):
    train = spark.createDataFrame(ROWS, "doc_id long, text string, source string")
    model = classify.nb_train(train)
    test = spark.createDataFrame(
        [(100, "zzz qqq unseen"), (101, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in classify.nb_classify(test, model).collect()}
    # eng has 3 of 5 training docs -> max prior; all-OOV == empty == prior-only
    assert got[100]["pred_label"] == "eng" and got[101]["pred_label"] == "eng"
    assert got[100]["log_score"] == pytest.approx(round(math.log(3 / 5), 6))
    assert got[100]["log_score"] == got[101]["log_score"]


def test_nb_all_scores_rank_and_tie_break(spark):
    # two labels with IDENTICAL token distributions and doc counts: every
    # score ties at 6 dp -> rank 1 must go to the smaller label
    rows = [
        (1, "same words here", "b_lab"),
        (2, "same words here", "a_lab"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    model = classify.nb_train(df)
    ranked = classify.nb_classify(df, model, all_scores=True).collect()
    assert {r["label"] for r in ranked} == {"a_lab", "b_lab"}
    for r in ranked:
        assert (r["rank"] == 1) == (r["label"] == "a_lab")
    pred = classify.nb_classify(df, model).collect()
    assert all(r["pred_label"] == "a_lab" for r in pred)


def test_nb_train_validates_alpha(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string, source string")
    with pytest.raises(ValueError):
        classify.nb_train(df, alpha=0.0)
