"""Distributed BPE induction: golden parity of the learned merges, merge
semantics pins, and the full loop — learn a vocab from the corpus, plug
the BPE tokenizer into the B1 registry, build an index with it, and get
rank-identical results from the Spark engine and the pure-Python golden
model."""

import pytest
from collections import Counter

from helpers import assert_ranked_equal
from tiny_search_engine_spark.build import BuildConfig, build_index
from tiny_search_engine_spark.config import QueryConfig
from tiny_search_engine_spark.golden.model import GoldenIndex, GoldenQueryEngine
from tiny_search_engine_spark.hashing import doc_sign
from tiny_search_engine_spark.pipeline import bpe
from tiny_search_engine_spark.query import QueryEngine
from tiny_search_engine_spark.synth import make_queries, source_files, source_files_local
from tiny_search_engine_spark.tokenizer import register_tokenizer


def test_learn_matches_pure_python(spark):
    rows = [
        (1, "low low low lower lower lowest"),
        (2, "new newer newer newest wide wider"),
        (3, "low new low new slow slower"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wf = Counter()
    for _, t in rows:
        wf.update(t.split())
    for n_merges in (5, 12):
        got = bpe.learn_bpe(df, n_merges=n_merges, min_freq=2)
        want = bpe.learn_bpe_local(dict(wf), n_merges=n_merges, min_freq=2)
        assert got == want, n_merges


def test_merge_is_left_to_right_non_overlapping(spark):
    # 'aaaa' with merge (a,a): left-to-right gives (aa)(aa), never (a)(aa)(a)
    df = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    merges = bpe.learn_bpe(df, n_merges=3, min_freq=1)
    assert merges == bpe.learn_bpe_local({"aaaa": 2}, n_merges=3, min_freq=1)
    assert merges[0] == ("a", "a")
    tok = bpe.BPETokenizer(merges)
    # encode applies ranks greedily; all emitted terms tile the word
    terms = [t.term for t in tok.tokens("aaaa")]
    assert "".join(terms) == "aaaa"


def test_tokenizer_offsets_and_marker_stripping():
    merges = [("l", "o"), ("lo", "w"), ("e", "r"), ("low", "</w>")]
    tok = bpe.BPETokenizer(merges)
    got = [(t.term, t.offset, t.length) for t in tok.tokens("low lower")]
    assert got[0] == ("low", 0, 3)          # 'low</w>' with marker stripped
    assert [t for t, _, _ in got[1:]] == ["low", "er"]
    # offsets tile each word exactly
    assert got[1][1] == 4 and got[2][1] == 7
    # early-stop: min_freq above every pair count learns nothing
    assert bpe.learn_bpe_local({"ab": 1}, n_merges=5, min_freq=2) == []


def test_bpe_index_build_and_query_parity(spark, stopwords, tmp_path):
    n = 40
    src = source_files(spark, n, seed=13)
    merges = bpe.learn_bpe(src.withColumnRenamed("content", "text"), n_merges=40, min_freq=2)
    assert len(merges) > 10  # the corpus must actually yield a vocabulary
    register_tokenizer("bpe_learned", bpe.BPETokenizer(merges))

    cfg = BuildConfig(
        tokenizer="bpe_learned",
        stopwords=frozenset(stopwords),
        postings_per_shard=64,
        block_size=16,
    )
    store = build_index(spark, src, str(tmp_path / "store"), cfg)
    assert store.meta()["tokenizer"] == "bpe_learned"

    golden = GoldenIndex(stopwords=stopwords, mode="bpe_learned")
    for d in source_files_local(n, seed=13):
        golden.add_doc(doc_sign(d["repo"], d["path"], d["commit"]), d["content"])
    golden.finalize()

    queries = [(i, q) for i, q in enumerate(make_queries(6, seed=3))]
    qcfg = QueryConfig(profile="standard", compat="fixed")
    eng = QueryEngine(spark, store, qcfg)
    g = GoldenQueryEngine(golden, cfg=qcfg)
    got = {}
    for r in eng.wand_topk(queries).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["bm25"]))
    for qid, q in queries:
        want = [(r.doc_sign, r.bm25) for r in g.bm25_topk(q)]
        have = [(d, s) for _, d, s in sorted(got.get(qid, []))]
        assert_ranked_equal(have, want, ctx=f"bpe wand q{qid} ({q!r})")


def test_marker_collision_with_literal_text():
    """Merges can build a symbol that LOOKS like the end-of-word marker
    from real characters ('</w>' in markup); only the positional marker
    may be stripped, and offsets must stay correct."""
    merges = [("<", "/"), ("</", "w"), ("</w", ">")]
    tok = bpe.BPETokenizer(merges)
    got = [(t.term, t.offset, t.length) for t in tok.tokens("x</w>y plain")]
    # the first word's tokens tile it exactly: no character vanishes
    assert "".join(t for t, off, _ in got if off < 6) == "x</w>y"
    # the literal '</w>' symbol is emitted whole, at its true offset
    assert ("</w>", 1, 4) in got
    # every token's slice matches the original text
    text = "x</w>y plain"
    for term, off, ln in got:
        assert text[off : off + ln] == term
