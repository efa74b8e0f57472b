"""Tokenizer semantics: offsets/lengths in chars, dup counting, text_len."""

from tiny_search_engine_spark.tokenizer import text_len, tokenize, tokenize_with_stats


def test_code_tokens_offsets():
    toks = tokenize("def foo(x): return x+1", "code")
    terms = [t.term for t in toks]
    assert terms == ["def", "foo", "(", "x", ")", ":", "return", "x", "+", "1"]
    assert toks[0].offset == 0 and toks[0].length == 3
    assert toks[1].offset == 4 and toks[1].length == 3
    # text_len = last token offset+length (reference node_def.cpp:100-103)
    assert text_len(toks) == 22 == len("def foo(x): return x+1")


def test_dup_counting():
    toks, dups, tmap = tokenize_with_stats("a b a B a", "code")
    # dup is 1-based occurrence count; sign is case-folded → B counts as b
    assert dups == [1, 1, 2, 2, 3]
    from tiny_search_engine_spark.hashing import term_sign

    a, b = term_sign("a"), term_sign("b")
    assert tmap[a][0] == 3 and tmap[b][0] == 2
    assert tmap[a][1] == 0 and tmap[b][1] == 1  # first occurrence index
    assert tmap[a][2] == [0, 4, 8]  # char offsets


def test_ws_mode():
    toks = tokenize("hello  world\nfoo", "ws")
    assert [t.term for t in toks] == ["hello", "world", "foo"]


def test_unicode_offsets_are_chars():
    toks = tokenize("日本 word", "ws")
    assert toks[1].offset == 3  # chars, not bytes
