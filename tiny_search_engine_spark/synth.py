"""Deterministic synthetic source-code corpus + query set (FIXTURES.md §1-5).

Matches BASELINE.json input_hint shape exactly:
``(repo:string, path:string, commit:string, lang:string, content:string)``.
Pure function of (seed, n_docs): no wall clock, no global RNG. Vocabulary is
Zipf-distributed so a few tokens (``the``, ``return``, ``def``, ``int`` …)
appear in a large fraction of docs — this exercises the skew path the north
rule demands (stopword-heavy terms split across doc shards).

Generated distributedly: a range DataFrame → mapInPandas expansion, so the
generator itself scales (no driver-side list of 10^12 docs).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ["python", "java", "cpp", "go", "js"]
_EXT = {"python": "py", "java": "java", "cpp": "cc", "go": "go", "js": "js"}

# High-frequency tokens shared across every doc class (the Zipf head —
# deliberately includes English stopword-ish and code keywords).
_HEAD = [
    "the", "a", "of", "to", "in", "and", "is", "for",
    "return", "def", "int", "if", "else", "while", "for", "class",
    "void", "self", "this", "new", "func", "var", "let", "const",
]

_KEYWORDS = {
    "python": ["def", "return", "self", "import", "class", "if", "else", "for", "in", "lambda"],
    "java": ["public", "class", "void", "int", "return", "new", "static", "final", "if", "else"],
    "cpp": ["int", "void", "return", "const", "auto", "class", "template", "if", "else", "for"],
    "go": ["func", "return", "int", "var", "if", "else", "for", "range", "struct", "package"],
    "js": ["function", "return", "const", "let", "var", "if", "else", "for", "new", "class"],
}

VOCAB_SIZE = 5000


def _vocab() -> list[str]:
    """Deterministic identifier vocabulary, rank 0 = most frequent."""
    words = []
    roots = [
        "get", "set", "run", "load", "save", "parse", "build", "merge", "split",
        "index", "query", "term", "doc", "token", "hash", "score", "rank",
        "node", "list", "map", "tree", "heap", "block", "shard", "batch",
        "read", "write", "open", "close", "init", "free", "alloc", "copy",
        "count", "total", "value", "key", "name", "path", "file", "data",
    ]
    sufs = ["", "s", "er", "ed", "ing", "_id", "_ptr", "_buf", "_len", "_cnt",
            "2", "32", "64", "_impl", "_util", "_mgr", "_ctx", "_cb"]
    for r in roots:
        for s in sufs:
            words.append(r + s)
    i = 0
    while len(words) < VOCAB_SIZE:
        words.append(f"sym{i:04d}")
        i += 1
    return words[:VOCAB_SIZE]


VOCAB = _vocab()


def _doc_rng(seed: int, i: int) -> np.random.Generator:
    # per-doc independent stream → generation order/partitioning irrelevant
    h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
    return np.random.Generator(np.random.PCG64(int.from_bytes(h[:8], "little")))


_ZIPF_A = 1.3


def _zipf_ranks(rng: np.random.Generator, n: int) -> np.ndarray:
    # bounded zipf over VOCAB_SIZE ranks via inverse-CDF on precomputed weights
    return _ZIPF_CDF.searchsorted(rng.random(n), side="right")


_w = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1), _ZIPF_A)
_ZIPF_CDF = np.cumsum(_w / _w.sum())
del _w


def make_doc(seed: int, i: int) -> dict:
    """One synthetic source file. Pure function of (seed, i)."""
    rng = _doc_rng(seed, i)
    lang = LANGS[i % len(LANGS)]
    # token count: log-normal-ish, 20..2000
    n_tok = int(min(2000, max(20, math.exp(rng.normal(4.6, 0.9)))))
    kw = _KEYWORDS[lang]
    parts: list[str] = []
    ranks = _zipf_ranks(rng, n_tok)
    choices = rng.random(n_tok)
    ops = ["=", "(", ")", "{", "}", ";", "+", ",", ".", "==", "->", ":"]
    for t in range(n_tok):
        c = choices[t]
        if c < 0.12:
            parts.append(_HEAD[int(ranks[t]) % len(_HEAD)])
        elif c < 0.22:
            parts.append(kw[int(ranks[t]) % len(kw)])
        elif c < 0.30:
            parts.append(ops[int(ranks[t]) % len(ops)])
        elif c < 0.34:
            parts.append(str(int(ranks[t])))
        else:
            parts.append(VOCAB[int(ranks[t])])
        # deterministic line breaks every ~12 tokens
        if t % 12 == 11:
            parts.append("\n")
    content = " ".join(parts)
    return {
        "repo": f"org{i % 97}/repo{i % 401}",
        "path": f"src/m{i % 13}/f{i}.{_EXT[lang]}",
        "commit": hashlib.sha256(f"c{i}".encode()).hexdigest()[:40],
        "lang": lang,
        "content": content,
    }


SOURCE_SCHEMA = "repo string, path string, commit string, lang string, content string"


def source_files(spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus: spark.range → mapInPandas expansion."""
    parts = partitions or max(8, spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            rows = [make_doc(seed, int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    return spark.range(0, n_docs, 1, parts).mapInPandas(gen, SOURCE_SCHEMA)


def source_files_local(n_docs: int, seed: int = 42) -> list[dict]:
    """Driver-side corpus for the golden model / tiny tests."""
    return [make_doc(seed, i) for i in range(n_docs)]


def make_queries(n_queries: int, seed: int = 42) -> list[str]:
    """Reference-style query set (FIXTURES.md §2): 1-6 tokens;
    60% mid-frequency, 20% high-frequency, 10% absent-from-corpus,
    10% repeated-token (exercises the dup>1 recall skip,
    /root/reference/src/table.cpp:349-351)."""
    out = []
    for q in range(n_queries):
        rng = _doc_rng(seed * 1_000_003 + 7, q)
        n = int(rng.integers(1, 7))
        kind = rng.random()
        toks: list[str] = []
        if kind < 0.6:
            idx = rng.integers(50, 1500, n)
            toks = [VOCAB[int(j)] for j in idx]
        elif kind < 0.8:
            idx = rng.integers(0, len(_HEAD), n)
            toks = [_HEAD[int(j)] for j in idx]
        elif kind < 0.9:
            toks = [f"zz_missing_{int(rng.integers(0, 10**6))}" for _ in range(n)]
        else:
            w = VOCAB[int(rng.integers(50, 1500))]
            toks = [w] * max(2, n)
        out.append(" ".join(toks))
    return out


def make_reference_corpus(n_lines: int = 200, seed: int = 42) -> list[str]:
    """FIXTURES.md §3: reference-shaped TSV lines ``query\\ttitle\\turl\\tlabel``
    with ~10% duplicate urls (different titles — exercises the reference's
    duplicate-url forward-overwrite / inverted-keep-first semantics,
    /root/reference/src/table.cpp:264,284-290) and a few short/invalid
    lines (parser requires ≥3 columns, table.cpp:160-166)."""
    lines = []
    for i in range(n_lines):
        rng = _doc_rng(seed * 77 + 3, i)
        if i % 29 == 7:
            lines.append(f"badline_with_one_field_{i}")
            continue
        if i % 31 == 11:
            lines.append(f"query only\tandtitle_{i}")  # 2 cols → skipped
            continue
        n = int(rng.integers(3, 12))
        title = " ".join(VOCAB[int(j)] for j in rng.integers(0, 800, n))
        query = " ".join(VOCAB[int(j)] for j in rng.integers(0, 800, int(rng.integers(1, 4))))
        url_i = i - 9 if (i % 10 == 9 and i > 9) else i  # ~10% dup urls
        url = f"http://example.com/doc/{url_i}"
        label = int(rng.integers(0, 3))
        lines.append(f"{query}\t{title}\t{url}\t{label}")
    return lines


def make_stopwords(top_n: int = 12) -> list[str]:
    """Fixture stopword list (FIXTURES.md §4): head tokens + punctuation."""
    return sorted(set(_HEAD[:top_n])) + ["=", ";", ",", ".", "(", ")", "{", "}"]


def make_synonyms(seed: int = 42, n_clusters: int = 100) -> list[list[str]]:
    """Fixture synonym clusters (FIXTURES.md §5): 2-5 vocabulary tokens per
    cluster, including substring pairs (exercises
    /root/reference/src/synonyms.cpp:65-68) and one oversized cluster
    (exercises the 10-per-term recall cap, conf/sys.conf:33)."""
    clusters = []
    for c in range(n_clusters):
        rng = _doc_rng(seed * 31 + 13, c)
        size = int(rng.integers(2, 6))
        base = int(rng.integers(0, 2000))
        cluster = [VOCAB[(base + k * 37) % 2000] for k in range(size)]
        if c % 7 == 0:
            # substring pair: 'index' vs 'index_id' style
            w = VOCAB[(base * 3) % 1000]
            cluster += [w, w + "_id"]
        clusters.append(sorted(set(cluster)))
    big = [VOCAB[(i * 53) % 3000] for i in range(16)]
    clusters.append(sorted(set(big)))
    return clusters
