"""Posting compression: decode(encode(x)) == x (SURVEY.md §5 property 3)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tiny_search_engine_spark.compress import (
    decode_doc_ids,
    decode_posting,
    encode_doc_ids,
    encode_posting,
    varbyte_decode,
    varbyte_encode,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200)
)
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert (varbyte_decode(varbyte_encode(arr)) == arr).all()


@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=200,
        unique=True,
    )
)
@settings(max_examples=200, deadline=None)
def test_docid_roundtrip(ids):
    arr = np.sort(np.array(ids, dtype=np.int64))
    assert (decode_doc_ids(encode_doc_ids(arr)) == arr).all()


def test_posting_roundtrip_and_blockmax():
    rng = np.random.default_rng(7)
    n = 1000
    ids = np.unique(rng.integers(-(2**40), 2**40, 2 * n, dtype=np.int64))[:n]
    tfs = rng.integers(1, 50, n)
    dls = rng.integers(10, 500, n)
    enc = encode_posting(ids, tfs, dls, block_size=128)
    d, t, dl = decode_posting(enc.doc_bytes, enc.tf_bytes, enc.dl_bytes)
    assert (d == ids).all()
    assert (t == tfs).all()
    assert (dl == dls).all()
    assert enc.n_docs == n
    assert len(enc.block_last) == (n + 127) // 128
    for bi, (last, mtf, mdl) in enumerate(
        zip(enc.block_last, enc.block_max_tf, enc.block_min_dl)
    ):
        s, e = bi * 128, min((bi + 1) * 128, n)
        assert last == ids[e - 1]
        assert mtf == tfs[s:e].max()
        assert mdl == dls[s:e].min()
    # compression actually compresses vs 8 bytes/doc raw
    assert len(enc.doc_bytes) < 8 * n
