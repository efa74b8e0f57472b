"""Fast-path build (fused map-side tokenize+reduce, no token table) must
produce the same term_stats, doc stats, and postings as the parity-path
build over the same corpus."""

import math

from tiny_search_engine_spark.build import BuildConfig, build_index
from tiny_search_engine_spark.compress import decode_posting
from tiny_search_engine_spark.synth import make_stopwords, source_files

N = 150


def _postings(spark, store):
    out = {}
    for r in store.postings(spark).collect():
        d, t, dl = decode_posting(bytes(r["doc_bytes"]), bytes(r["tf_bytes"]), bytes(r["dl_bytes"]))
        out.setdefault(r["term_sign"], []).extend(zip(d.tolist(), t.tolist(), dl.tolist()))
    return {k: sorted(v) for k, v in out.items()}


def test_fast_path_equals_parity_path(spark, tmp_path):
    src = source_files(spark, N, seed=31)
    stop = frozenset(make_stopwords())
    slow = build_index(
        spark, src, str(tmp_path / "slow"), BuildConfig(stopwords=stop, write_tokens=True)
    )
    fast = build_index(
        spark, src, str(tmp_path / "fast"), BuildConfig(stopwords=stop, write_tokens=False)
    )
    ts_s = {r["term_sign"]: (r["df"], r["ttf"], r["idf"]) for r in slow.term_stats(spark).collect()}
    ts_f = {r["term_sign"]: (r["df"], r["ttf"], r["idf"]) for r in fast.term_stats(spark).collect()}
    assert ts_s == ts_f
    assert _postings(spark, slow) == _postings(spark, fast)
    ds_s = {r["doc_id"]: r for r in slow.docs(spark).collect()}
    ds_f = {r["doc_id"]: r for r in fast.docs(spark).collect()}
    assert set(ds_s) == set(ds_f)
    for k in ds_s:
        assert ds_s[k]["doc_len"] == ds_f[k]["doc_len"]
        assert ds_s[k]["n_terms"] == ds_f[k]["n_terms"]
        assert math.isclose(ds_s[k]["vec_module"], ds_f[k]["vec_module"], rel_tol=1e-9)
        assert math.isclose(ds_s[k]["wei_sum"], ds_f[k]["wei_sum"], rel_tol=1e-9)
    assert slow.meta()["avg_doc_len"] == fast.meta()["avg_doc_len"]
    assert fast.meta()["write_tokens"] is False
