"""Posting-list physical format: docID-delta + varbyte compression with
block-max skip metadata. Pure numpy — runs inside ``applyInPandas`` groups
at build time and inside the WAND ``applyInPandas`` at query time.

The reference stores postings as ``unordered_set<DocNode>`` of raw 8-byte
ids (/root/reference/include/node_def.h:92-124) — ~8 B/doc with no
skipping. This format is the scale-path replacement demanded by the north
rule: sorted docIDs, delta + varbyte (typically 1-2 B/doc), aligned varbyte
tf and doc_len streams, and per-block (last_doc, max_tf, min_doc_len)
metadata enabling block-max WAND pruning with profile-independent upper
bounds (BM25 is monotonically increasing in tf and decreasing in doc_len).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

_SIGN_FLIP = np.uint64(1) << np.uint64(63)


def _to_unsigned_order(v: np.ndarray) -> np.ndarray:
    """Order-preserving int64 → uint64 transform (adds 2^63)."""
    return v.astype(np.int64).view(np.uint64) + _SIGN_FLIP


def _from_unsigned_order(u: np.ndarray) -> np.ndarray:
    return (u - _SIGN_FLIP).view(np.int64)


def varbyte_encode(values: np.ndarray) -> bytes:
    """LEB128-style varbyte encode of uint64 values (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    tmp = v >> np.uint64(7)
    nbytes = np.ones(v.shape, dtype=np.int64)
    while tmp.any():
        nbytes += (tmp != 0).astype(np.int64)
        tmp >>= np.uint64(7)
    offsets = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.zeros(offsets[-1], dtype=np.uint8)
    max_b = int(nbytes.max())
    for k in range(max_b):
        mask = nbytes > k
        pos = offsets[:-1][mask] + k
        chunk = (v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > k).astype(np.uint8) << 7
        out[pos] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Inverse of varbyte_encode → uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    k = np.arange(b.size, dtype=np.int64) - np.repeat(starts, lengths)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (7 * k).astype(np.uint64)
    return np.add.reduceat(contrib, starts)


def encode_doc_ids(doc_ids: np.ndarray) -> bytes:
    """Sorted signed-int64 docIDs → first value + deltas, varbyte."""
    u = _to_unsigned_order(np.asarray(doc_ids, dtype=np.int64))
    deltas = np.empty_like(u)
    deltas[0] = u[0]
    deltas[1:] = u[1:] - u[:-1]
    return varbyte_encode(deltas)


def decode_doc_ids(buf: bytes) -> np.ndarray:
    deltas = varbyte_decode(buf)
    if deltas.size == 0:
        return np.empty(0, dtype=np.int64)
    return _from_unsigned_order(np.cumsum(deltas, dtype=np.uint64))


class EncodedPosting(NamedTuple):
    n_docs: int
    doc_bytes: bytes
    tf_bytes: bytes
    dl_bytes: bytes
    block_last: list[int]  # last docID per block (skip pointers)
    block_max_tf: list[int]  # per-block max term frequency
    block_min_dl: list[int]  # per-block min doc length
    bytes_total: int


def encode_posting(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    block_size: int = 128,
    presorted: bool = False,
) -> EncodedPosting:
    """Encode one (term, shard) posting list. Inputs need not be sorted
    unless *presorted* (sort-based build path: rows arrive doc_id-asc
    from the shuffle sort — signed order == unsigned-delta order since
    the transform is monotone)."""
    if presorted:
        d = np.ascontiguousarray(doc_ids, dtype=np.int64)
        t = np.ascontiguousarray(tfs, dtype=np.int64)
        dl = np.ascontiguousarray(doc_lens, dtype=np.int64)
    else:
        order = np.argsort(doc_ids, kind="stable")
        d = np.asarray(doc_ids, dtype=np.int64)[order]
        t = np.asarray(tfs, dtype=np.int64)[order]
        dl = np.asarray(doc_lens, dtype=np.int64)[order]
    doc_b = encode_doc_ids(d)
    tf_b = varbyte_encode(t.astype(np.uint64))
    dl_b = varbyte_encode(dl.astype(np.uint64))
    n = d.size
    nb = (n + block_size - 1) // block_size
    block_last, block_max_tf, block_min_dl = [], [], []
    for bi in range(nb):
        s, e = bi * block_size, min((bi + 1) * block_size, n)
        block_last.append(int(d[e - 1]))
        block_max_tf.append(int(t[s:e].max()))
        block_min_dl.append(int(dl[s:e].min()))
    return EncodedPosting(
        n_docs=int(n),
        doc_bytes=doc_b,
        tf_bytes=tf_b,
        dl_bytes=dl_b,
        block_last=block_last,
        block_max_tf=block_max_tf,
        block_min_dl=block_min_dl,
        bytes_total=len(doc_b) + len(tf_b) + len(dl_b),
    )


def range_shard(doc_ids: np.ndarray, n_shards: int) -> np.ndarray:
    """Doc-RANGE shard of each doc id at pow2 granularity *n_shards* —
    numpy twin of the build-side SQL expression (build.py job_postings):
    top log2(n_shards) bits of the order-preserving unsigned doc id."""
    if n_shards <= 1:
        return np.zeros(len(doc_ids), dtype=np.int64)
    k = int(n_shards).bit_length() - 1
    u = np.asarray(doc_ids, dtype=np.int64).view(np.uint64) ^ _SIGN_FLIP
    return (u >> np.uint64(64 - k)).astype(np.int64)


def decode_posting(doc_bytes: bytes, tf_bytes: bytes, dl_bytes: bytes):
    """→ (doc_ids int64 sorted, tfs int64, doc_lens int64)."""
    d = decode_doc_ids(doc_bytes)
    t = varbyte_decode(tf_bytes).astype(np.int64)
    dl = varbyte_decode(dl_bytes).astype(np.int64)
    return d, t, dl
