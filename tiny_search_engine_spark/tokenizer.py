"""Deterministic, self-contained tokenizers shared verbatim by the Spark
engine and the pure-Python golden model.

The reference tokenizes with cppjieba MIX mode
(/root/reference/src/segment.cpp:60-76,103-126) whose main dictionaries are
missing blobs in this checkout (/root/reference/.MISSING_LARGE_BLOBS), so
exact jieba output is unreproducible; the tokenizer is therefore pluggable
and rank-identity is defined at pipeline level with the SAME tokenizer on
both sides (SURVEY.md §2 B1).

Two tokenizers:

- ``code``: for source code — identifiers, numbers, single
  operator/punctuation chars. Matches how a code search engine would
  index; emits (term, char_offset, char_length) like the reference's
  TermNode (offset/length in unicode chars, node_def.h:25-46).
- ``ws``: whitespace splitting — used by the DuckDB-oracle queries in
  __spark_entry__.py because it is expressible in ANSI SQL on both engines.

Signs are case-folded (reference: segment.cpp:68); display text is not.
"""

from __future__ import annotations

import re
from typing import Iterator, NamedTuple

import pandas as pd
import pyarrow  # noqa: F401  (documents the Arrow dependency of the UDF path)

from .hashing import term_sign


class Token(NamedTuple):
    term: str
    offset: int  # unicode char offset
    length: int  # unicode char length


_CODE_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|\d+(?:\.\d+)?|[^\w\s]")
_WS_RE = re.compile(r"\S+")

_PATTERNS = {"code": _CODE_RE, "ws": _WS_RE}


def tokenize(text: str, mode: str = "code") -> list[Token]:
    """Pure function: text → [(term, offset, length)]. Deterministic."""
    pat = _PATTERNS[mode]
    return [Token(m.group(0), m.start(), m.end() - m.start()) for m in pat.finditer(text)]


def tokenize_with_stats(text: str, mode: str = "code"):
    """Tokens + the reference's per-string pass (segment.cpp:78-101):

    returns (tokens, dup list (1-based occurrence counts, aligned with
    tokens), term_map {sign: (term_freq, first_idx, offsets)}).
    Signs are signed-int64 xxhash64(lower(term)).
    """
    toks = tokenize(text, mode)
    dup: list[int] = []
    term_map: dict[int, list] = {}  # sign -> [tf, first_idx, offsets]
    for i, t in enumerate(toks):
        s = term_sign(t.term)
        ent = term_map.get(s)
        if ent is None:
            term_map[s] = [1, i, [t.offset]]
            dup.append(1)
        else:
            ent[0] += 1
            ent[2].append(t.offset)
            dup.append(ent[0])
    return toks, dup, term_map


def text_len(toks: list[Token]) -> int:
    """The reference's doc/query length: last token offset+length in chars
    (node_def.cpp:100-103, table.cpp:646-648) — NOT len(text)."""
    if not toks:
        return 0
    last = toks[-1]
    return last.offset + last.length


# ---------------------------------------------------------------------------
# Spark side: Arrow-vectorized tokenize for mapInPandas.
# ---------------------------------------------------------------------------

TOKENS_SCHEMA = (
    "doc_id long, pos int, term string, offset int, length int, dup int"
)


def make_tokenize_iterator(mode: str, id_col: str = "doc_id", text_col: str = "content"):
    """Returns an ``iterator[pd.DataFrame] -> iterator[pd.DataFrame]``
    function for ``df.mapInPandas(fn, TOKENS_SCHEMA)``.

    One output row per token occurrence. ``dup`` is the 1-based occurrence
    count of the term within the doc so far (reference segment.cpp:89-99);
    term signs are added JVM-side afterwards via F.xxhash64(F.lower(term))
    so the Python stage stays string-only.
    """
    pat = _PATTERNS[mode]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            poss: list[int] = []
            terms: list[str] = []
            offs: list[int] = []
            lens: list[int] = []
            dups: list[int] = []
            for did, text in zip(pdf[id_col].to_numpy(), pdf[text_col].to_numpy()):
                if text is None:
                    continue
                seen: dict[str, int] = {}
                pos = 0
                for m in pat.finditer(text):
                    w = m.group(0)
                    lw = w.lower()
                    c = seen.get(lw, 0) + 1
                    seen[lw] = c
                    ids.append(did)
                    poss.append(pos)
                    terms.append(w)
                    offs.append(m.start())
                    lens.append(m.end() - m.start())
                    dups.append(c)
                    pos += 1
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "pos": pd.Series(poss, dtype="int32"),
                    "term": pd.Series(terms, dtype="object"),
                    "offset": pd.Series(offs, dtype="int32"),
                    "length": pd.Series(lens, dtype="int32"),
                    "dup": pd.Series(dups, dtype="int32"),
                }
            )

    return fn


DOC_TERM_SCHEMA = (
    "doc_id long, term string, tf int, first_idx int, doc_len int, n_terms int"
)


def make_doc_term_iterator(mode: str, id_col: str = "doc_id", text_col: str = "content"):
    """Map-side per-doc aggregation (the reference's ``update_global_info``
    pass, segment.cpp:78-101, fused into tokenization): emits one row per
    (doc, DISTINCT term) with tf/first_idx plus the doc-level doc_len and
    n_terms replicated on each row.

    This is the fast-path tokenize stage: it removes the token-level
    shuffle entirely (the per-(doc,term) reduction happens in Python where
    the tokens already live) — at 100 TB that is the difference between
    shuffling ~10^13 occurrence rows and ~0.4x as many pre-reduced rows.
    The positional token table (needed only by the exact feature-parity
    path) is written separately when BuildConfig.write_tokens is set."""
    pat = _PATTERNS[mode]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            terms: list[str] = []
            tfs: list[int] = []
            firsts: list[int] = []
            dlens: list[int] = []
            nterms: list[int] = []
            for did, text in zip(pdf[id_col].to_numpy(), pdf[text_col].to_numpy()):
                if text is None:
                    continue
                stats: dict[str, list] = {}  # lower(term) -> [display, tf, first]
                pos = 0
                end = 0
                for m in pat.finditer(text):
                    w = m.group(0)
                    lw = w.lower()
                    ent = stats.get(lw)
                    if ent is None:
                        stats[lw] = [w, 1, pos]
                    else:
                        ent[1] += 1
                    end = m.end()
                    pos += 1
                if pos == 0:
                    continue
                dl = end  # last token offset+length (node_def.cpp:100-103)
                for lw, (disp, tf, first) in stats.items():
                    ids.append(did)
                    terms.append(disp)
                    tfs.append(tf)
                    firsts.append(first)
                    dlens.append(dl)
                    nterms.append(pos)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "term": pd.Series(terms, dtype="object"),
                    "tf": pd.Series(tfs, dtype="int32"),
                    "first_idx": pd.Series(firsts, dtype="int32"),
                    "doc_len": pd.Series(dlens, dtype="int32"),
                    "n_terms": pd.Series(nterms, dtype="int32"),
                }
            )

    return fn
