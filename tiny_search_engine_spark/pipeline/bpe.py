"""Distributed BPE vocabulary induction + a registry-pluggable subword
tokenizer.

Learning runs Sennrich-style byte-pair-encoding (Sennrich et al. 2016)
but against the WORD-FREQUENCY table, not the corpus: one corpus pass
builds (word, freq) — dictionary-sized under Zipf even at 100 TB — and
every merge iteration is an explode + groupBy over that small table, so
the per-iteration cost is O(|vocab| · avg_word_len), independent of
corpus size. Pair counting, argmax selection (count desc, pair asc —
deterministic), and the in-place merge of each word's symbol array are
all JVM column algebra; only the single winning pair per iteration is
collected. Lineage is localCheckpoint-truncated every few merges (same
discipline as graph.pagerank / dedup.resolve_clusters).

The learned merge list feeds ``BPETokenizer``, a ``tokenizer.Tokenizer``
that plugs into the B1 registry — the fused build path, the positional
token table, query analysis, and the pure-Python golden model all resolve
it by name, so an index can be built and queried with a vocabulary
learned from the corpus itself (tests/test_bpe.py drives that loop).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenizer import Token, Tokenizer
from .textstats import _lower_tokens

END = "</w>"  # end-of-word marker symbol (its own array slot)


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass: lower-cased whitespace word frequencies (the same
    token rule as textstats/packing — one shared expression)."""
    return (
        df.select(F.explode(_lower_tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_pair_expr(syms, a: str, b: str):
    """Replace adjacent (a, b) with a+b, left-to-right non-overlapping —
    the merged symbol does NOT re-pair with the next element in the same
    pass (Sennrich semantics). One aggregate lambda; `pend` holds the
    symbol whose merge decision is still open ('' = none; symbols are
    never empty strings)."""
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit("").alias("pend")
    )

    def step(acc, x):
        merged = (acc["pend"] == a) & (x == b)
        out = F.when(merged, F.concat(acc["out"], F.array(F.lit(a + b)))).otherwise(
            F.when(acc["pend"] != "", F.concat(acc["out"], F.array(acc["pend"]))).otherwise(
                acc["out"]
            )
        )
        pend = F.when(merged, F.lit("")).otherwise(x)
        return F.struct(out.alias("out"), pend.alias("pend"))

    def finish(acc):
        return F.when(
            acc["pend"] != "", F.concat(acc["out"], F.array(acc["pend"]))
        ).otherwise(acc["out"])

    return F.aggregate(syms, acc0, step, finish)


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_freq: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges; stops early when the best
    pair's frequency drops below ``min_freq``. Returns merges in rank
    order."""
    vocab = word_freqs(df, text_col=text_col).withColumn(
        "syms",
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(END))),
    )
    vocab = vocab.localCheckpoint()
    merges: list[tuple[str, str]] = []
    for it in range(n_merges):
        pairs = vocab.select(
            "freq",
            F.explode(
                F.arrays_zip(
                    F.slice("syms", 1, F.size("syms") - 1).alias("a"),
                    F.slice("syms", 2, F.size("syms") - 1).alias("b"),
                )
            ).alias("p"),
        ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "freq")
        top = (
            pairs.groupBy("a", "b")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < min_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = vocab.withColumn("syms", _merge_pair_expr(F.col("syms"), a, b))
        if (it + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    return merges


def learn_bpe_local(word_freq: dict[str, int], n_merges: int, min_freq: int = 2):
    """Pure-Python Sennrich reference (the golden twin for tests):
    identical tie-breaks, identical early stop."""
    from collections import Counter

    vocab = {tuple(w) + (END,): f for w, f in word_freq.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[pair] < min_freq:
            break
        merges.append(pair)
        a, b = pair
        new_vocab = {}
        for syms, f in vocab.items():
            out, pend = [], None
            for x in syms:
                if pend == a and x == b:
                    out.append(a + b)
                    pend = None
                else:
                    if pend is not None:
                        out.append(pend)
                    pend = x
            if pend is not None:
                out.append(pend)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


class BPETokenizer(Tokenizer):
    """Subword tokenizer from a learned merge list, pluggable via
    ``register_tokenizer``. Words (whitespace-split, case-folded for
    merge application) are encoded by applying merges in rank order —
    the standard lowest-rank-adjacent-pair loop — and each subword is
    emitted with its true character offset/length in the original text;
    the end-of-word marker is stripped from emitted terms."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self._word_re = re.compile(r"\S+")

    def _encode(self, word: str) -> list[tuple[str, bool]]:
        """(symbol, carries_marker) pairs. The end-of-word marker is
        tracked POSITIONALLY, not by string suffix: text containing the
        literal characters '</w>' can legitimately merge into a symbol
        that LOOKS like the marker (this is a code/markup engine), and a
        suffix check would strip real characters and corrupt offsets.
        The marker starts as the last element and only ever merges as a
        RIGHT partner, so a flagged symbol always carries it as a
        suffix."""
        syms = list(word) + [END]
        marker = [False] * len(word) + [True]
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = self.ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            marker[best_i : best_i + 2] = [marker[best_i] or marker[best_i + 1]]
        return list(zip(syms, marker))

    def tokens(self, text: str) -> list[Token]:
        out: list[Token] = []
        for m in self._word_re.finditer(text):
            pos = m.start()
            for sym, has_marker in self._encode(m.group(0).lower()):
                term = sym[: -len(END)] if has_marker else sym
                if term:
                    out.append(Token(text[pos : pos + len(term)], pos, len(term)))
                    pos += len(term)
        return out
