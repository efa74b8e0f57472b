"""Sequence packing: brute-force parity, chunk-tiling invariants,
bucketing/partitioning invariance, and the no-global-window plan pin."""

import pytest
from pyspark.sql import functions as F

from tiny_search_engine_spark.pipeline import packing


def _brute_pack(rows, chunk_len):
    out = []
    off = 0
    for doc_id, text in sorted(rows):
        n = len([t for t in text.lower().split() if t])
        if n == 0:
            continue
        start = off
        while start < off + n:
            c = start // chunk_len
            seg_end = min(off + n, (c + 1) * chunk_len)
            out.append((c, doc_id, start - off, start - c * chunk_len, seg_end - start))
            start = seg_end
        off += n
    return sorted(out)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "a b c d e"),            # 5 tokens
        (2, ""),                     # zero tokens -> dropped
        (3, "f g h"),                # 3
        (4, " ".join(["w"] * 23)),   # longer than two chunks at len 8
        (5, "x y"),                  # 2
        (9, "tail doc here"),        # 3
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_matches_brute(corpus):
    rows, df = corpus
    got = sorted(
        tuple(r) for r in packing.pack_sequences(df, chunk_len=8).collect()
    )
    assert got == _brute_pack(rows, 8)


def test_pack_chunk_tiling(corpus):
    rows, df = corpus
    seg = packing.pack_sequences(df, chunk_len=8)
    per_chunk = {
        r["chunk_id"]: r["s"]
        for r in seg.groupBy("chunk_id").agg(F.sum("seg_len").alias("s")).collect()
    }
    total = sum(len(t.split()) for _, t in rows)
    n_chunks = max(per_chunk) + 1
    for c, s in per_chunk.items():
        assert s == (8 if c < n_chunks - 1 else total - 8 * (n_chunks - 1))
    # each doc's segments tile the doc exactly, in order
    by_doc = {}
    for r in seg.collect():
        by_doc.setdefault(r["doc_id"], []).append((r["doc_offset"], r["seg_len"]))
    for doc_id, text in rows:
        n = len(text.split())
        if n == 0:
            assert doc_id not in by_doc
            continue
        segs = sorted(by_doc[doc_id])
        assert segs[0][0] == 0
        pos = 0
        for o, ln in segs:
            assert o == pos
            pos += ln
        assert pos == n


def test_pack_invariance(corpus):
    rows, df = corpus
    want = sorted(tuple(r) for r in packing.pack_sequences(df, chunk_len=8).collect())
    for n_buckets in (1, 2, 7):
        got = sorted(
            tuple(r)
            for r in packing.pack_sequences(
                df.repartition(5), chunk_len=8, n_buckets=n_buckets
            ).collect()
        )
        assert got == want, n_buckets


def test_pack_no_global_window(spark, corpus):
    _, df = corpus
    plan = packing.pack_sequences(df, chunk_len=8)._jdf.queryExecution().executedPlan().toString()
    # a global corpus cumsum would plan as an UNPARTITIONED window ordered
    # by doc_id, rendering as windowspecdefinition(doc_id#.. ASC ...) with
    # the order column first; in the two-phase plan doc_id only ever
    # appears AFTER the _bkt partition column, and the one legitimately
    # unpartitioned window orders by _bkt over <= n_buckets rows
    assert "windowspecdefinition(doc_id" not in plan
    assert "windowspecdefinition(_bkt" in plan


def test_pack_rejects_bad_chunk_len(corpus):
    _, df = corpus
    with pytest.raises(ValueError):
        packing.pack_sequences(df, chunk_len=0)


def test_pack_rejects_bad_n_buckets(corpus):
    _, df = corpus
    for bad in (0, -4):
        with pytest.raises(ValueError, match="n_buckets"):
            packing.pack_sequences(df, chunk_len=8, n_buckets=bad)
