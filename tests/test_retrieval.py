"""Positional phrase search + more-like-this: behavioral pins on crafted
inputs (DuckDB-oracle equivalence runs in scripts/check_oracles.py)."""

import pytest
from pyspark.sql import functions as F

from tiny_search_engine_spark.pipeline import retrieval


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "big table scan big table scan"),      # "big table" twice
        (1, "table big scan"),                     # terms present, wrong order
        (2, "big  table"),                         # multi-space: still adjacent
        (3, "big stone table"),                    # gap: not a phrase hit
        (4, "completely different words here"),
        (5, "big table scan big table scan"),      # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_phrase_match_adjacency_and_counts(corpus):
    out = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["n_occurrences"])
        for r in retrieval.phrase_match(corpus, [(0, "big table"), (1, "big table scan")]).collect()
    }
    # "big table": docs 0 and 5 twice each (rank by count then id), doc 2 once
    assert out[(0, 0)] == (1, 2) and out[(0, 5)] == (2, 2) and out[(0, 2)] == (3, 1)
    assert (0, 1) not in out  # wrong order is not a phrase
    assert (0, 3) not in out  # gap breaks adjacency
    # the 3-term phrase
    assert out[(1, 0)] == (1, 2) and out[(1, 5)] == (2, 2)
    assert (1, 2) not in out  # "big table" without "scan" after


def test_phrase_match_repeated_term_phrase(spark):
    df = spark.createDataFrame(
        [(0, "go go go stop"), (1, "go stop go")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["n_occurrences"]
        for r in retrieval.phrase_match(df, [(7, "go go")]).collect()
    }
    assert out == {0: 2}  # positions (0,1) and (1,2); doc 1 never adjacent


def test_more_like_this_prefers_duplicate_then_overlap(corpus):
    out = {}
    for r in retrieval.more_like_this(corpus, [0], k=5).collect():
        out[r["rank"]] = (r["doc_id"], r["sim"])
    # cosine is bag-of-words: doc 1 (same proportions, different order)
    # and doc 5 (exact duplicate) both hit 1.0; tie-break by doc id
    assert out[1] == (1, 1.0) and out[2] == (5, 1.0)
    # overlapping docs beat the disjoint doc 4, which never appears
    ranked_ids = [d for d, _ in out.values()]
    assert 4 not in ranked_ids
    assert set(ranked_ids) == {5, 1, 2, 3}


def test_more_like_this_excludes_seed_and_caps_terms(corpus):
    rows = retrieval.more_like_this(corpus, [0, 1], k=3, max_query_terms=2).collect()
    assert all(r["doc_id"] != r["seed_id"] for r in rows)
    by_seed = {}
    for r in rows:
        by_seed.setdefault(r["seed_id"], []).append(r["rank"])
    assert set(by_seed) == {0, 1}
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_seed.values())
