"""B1 pluggable-tokenizer seam: a THIRD tokenizer registered through the
public hook (no edits to tokenizer internals) must flow through the whole
stack — fused build fast path, positional token table, query analysis, and
the pure-Python golden model — with rank-identical results per mode.

The dict mode is a jieba-MP-style longest-match over a wordlist (what the
reference's cppjieba MP does, /root/reference/src/segment.cpp:60-76, modulo
its missing dict blobs)."""

import pytest

from helpers import assert_ranked_equal
from tiny_search_engine_spark.build import BuildConfig, build_index
from tiny_search_engine_spark.config import QueryConfig
from tiny_search_engine_spark.golden.model import GoldenIndex, GoldenQueryEngine
from tiny_search_engine_spark.hashing import doc_sign
from tiny_search_engine_spark.query import QueryEngine
from tiny_search_engine_spark.synth import make_queries, source_files, source_files_local
from tiny_search_engine_spark.tokenizer import (
    DictAllTokenizer,
    DictSearchTokenizer,
    DictTokenizer,
    register_tokenizer,
    tokenize,
)

N = 80
QUERIES = [(i, q) for i, q in enumerate(make_queries(8, seed=7))]


def _dict_wordlist() -> list[str]:
    """Deterministic wordlist: the corpus vocabulary (via the code
    tokenizer) plus the query vocabulary, so longest-match has real
    multi-char entries to find; everything else degrades to single-char
    OOV tokens like jieba."""
    vocab = set()
    for d in source_files_local(N, seed=11):
        vocab.update(t.term.lower() for t in tokenize(d["content"], "code"))
    for _, q in QUERIES:
        vocab.update(t.term.lower() for t in tokenize(q, "code"))
    return sorted(w for w in vocab if w.isalnum())


_WORDS = _dict_wordlist()
register_tokenizer("dict", DictTokenizer(_WORDS))
register_tokenizer("dict_all", DictAllTokenizer(_WORDS))
register_tokenizer("dict_search", DictSearchTokenizer(_WORDS))

# every reference SegmentMode except HMM-backed ones (MP≈dict,
# ALL≈dict_all, SEARCH/MIX≈dict_search; HMM needs the model blobs absent
# from the reference checkout, /root/reference/.MISSING_LARGE_BLOBS)
MODES = ["code", "ws", "dict", "dict_all", "dict_search"]


@pytest.fixture(scope="module", params=MODES)
def mode_store(request, spark, stopwords, tmp_path_factory):
    mode = request.param
    out = str(tmp_path_factory.mktemp(f"seam_{mode}") / "store")
    src = source_files(spark, N, seed=11)
    cfg = BuildConfig(
        tokenizer=mode,
        stopwords=frozenset(stopwords),
        postings_per_shard=64,
        block_size=16,
    )
    store = build_index(spark, src, out, cfg)
    golden = GoldenIndex(stopwords=stopwords, mode=mode)
    for d in source_files_local(N, seed=11):
        golden.add_doc(doc_sign(d["repo"], d["path"], d["commit"]), d["content"])
    golden.finalize()
    return mode, store, golden


def test_mode_parity_bm25_and_wand(spark, mode_store):
    mode, store, golden = mode_store
    assert store.meta()["tokenizer"] == mode
    cfg = QueryConfig(profile="standard", compat="fixed")
    eng = QueryEngine(spark, store, cfg)
    g = GoldenQueryEngine(golden, cfg=cfg)

    got = {}
    for r in eng.bm25_topk(QUERIES).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["bm25"]))
    wand = {}
    for r in eng.wand_topk(QUERIES).collect():
        wand.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["bm25"]))
    for qid, q in QUERIES:
        want = [(r.doc_sign, r.bm25) for r in g.bm25_topk(q)]
        have = [(d, s) for _, d, s in sorted(got.get(qid, []))]
        have_w = [(d, s) for _, d, s in sorted(wand.get(qid, []))]
        assert_ranked_equal(have, want, ctx=f"{mode} bm25 q{qid} ({q!r})")
        assert_ranked_equal(have_w, want, ctx=f"{mode} wand q{qid} ({q!r})")


def test_mode_results_actually_differ(spark, stopwords, tmp_path_factory):
    """Guard against the seam being a no-op: dict mode must tokenize
    differently from code mode on punctuation-glued text."""
    toks_code = [t.term for t in tokenize("foo.bar(x)", "code")]
    register_tokenizer("dict2", DictTokenizer(["foo.bar", "x"]))
    toks_dict = [t.term for t in tokenize("foo.bar(x)", "dict2")]
    assert toks_code != toks_dict
    assert "foo.bar" in toks_dict  # longest-match crossed the '.' boundary


def test_cut_all_emits_overlapping_matches():
    """ALL mode: every dictionary word at every start, plus single-char
    OOV for uncovered positions; offsets overlap."""
    tok = DictAllTokenizer(["foo", "foobar", "bar", "z"])
    got = [(t.term, t.offset, t.length) for t in tok.tokens("foobarz!")]
    assert got == [
        ("foo", 0, 3), ("foobar", 0, 6), ("bar", 3, 3), ("z", 6, 1), ("!", 7, 1),
    ]


def test_cut_for_search_emits_subwords():
    """SEARCH mode: longest-match segments enriched with their
    in-dictionary 2/3-char sub-words (strictly shorter than the segment)."""
    tok = DictSearchTokenizer(["abcd", "ab", "cd", "bcd", "x"])
    got = [t.term for t in tok.tokens("abcd x")]
    # sub-2grams (ab, cd), sub-3gram (bcd), then the segment itself
    assert got == ["ab", "cd", "bcd", "abcd", "x"]
    # a 2-char segment emits nothing extra (strictly-longer gate)
    assert [t.term for t in tok.tokens("ab")] == ["ab"]


def test_unknown_mode_fails_loudly():
    with pytest.raises(KeyError, match="register_tokenizer"):
        tokenize("x", "no_such_mode")
