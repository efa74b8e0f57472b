"""selection.py (DSIR weights/resampling, CMS-narrowed heavy hitters) and
simsearch.mine_contrastive_pairs: pure-Python-twin parity, determinism,
sketch-parameter invariance. DuckDB-oracle equivalence runs in
scripts/check_oracles.py + the driver."""

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tiny_search_engine_spark.pipeline import selection, simsearch

B = 64  # small bucket table → real collisions in the test corpus

VOCAB = [f"w{i}" for i in range(40)]


def _mk_text(i: int, flavor: str) -> str:
    # zipf-ish: token j appears ~ 40/(j+1) times; flavors shift the head
    toks = []
    for j in range(40):
        reps = max(1, (40 // (j + 1)) // 4)
        if flavor == "tgt" and j % 3 == 0:
            reps *= 3  # target flavor over-uses every 3rd word
        toks.extend([VOCAB[(j + (i % 5)) % 40]] * reps)
    return " ".join(toks)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, _mk_text(i, "tgt" if i % 4 == 0 else "raw"),
         "en" if i % 4 == 0 else "xx", "synth", 100)
        for i in range(60)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _grams(text):
    toks = [t for t in text.lower().split() if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(key, salt, modulus):
    return int(hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8], 16) % modulus


def _py_dsir(rows, n_buckets=B, add_k=1.0):
    """Pure-Python dsir_logweights twin (target = lang == 'en')."""
    tb, qb = Counter(), Counter()
    for _id, text, lang in rows:
        for g in _grams(text):
            b = _bucket(g, "dsir", n_buckets)
            qb[b] += 1
            if lang == "en":
                tb[b] += 1
    T, Q = sum(tb.values()), sum(qb.values())
    const = math.log(Q + add_k * n_buckets) - math.log(T + add_k * n_buckets)
    out = {}
    for _id, text, lang in rows:
        cb = Counter(_bucket(g, "dsir", n_buckets) for g in _grams(text))
        n = sum(cb.values())
        s = sum(
            c * (math.log(tb[b] + add_k) - math.log(qb[b] + add_k))
            for b, c in cb.items()
        )
        out[_id] = (n, s + n * const)
    return out


def test_dsir_weights_matches_pure_python(docs):
    rows = [(r.doc_id, r.text, r.lang) for r in docs.collect()]
    want = _py_dsir(rows)
    got = selection.dsir_logweights(
        docs, docs.filter(F.col("lang") == "en"), n_buckets=B
    ).collect()
    assert len(got) == len(rows)
    for r in got:
        n, lw = want[r.doc_id]
        assert r.n_grams == n
        assert abs(r.log_weight - round(lw, 6)) < 2e-6, r.doc_id


def test_dsir_weights_separate_target_from_raw(docs):
    """Docs drawn from the target flavor must out-score the raw flavor on
    average — the one property that makes DSIR selection useful."""
    w = selection.dsir_logweights(
        docs, docs.filter(F.col("lang") == "en"), n_buckets=B
    )
    avg = {
        r.lang: r.a
        for r in w.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.avg("log_weight").alias("a"))
        .collect()
    }
    assert avg["en"] > avg["xx"]


def test_dsir_weights_empty_doc_and_args(spark, docs):
    empty = spark.createDataFrame(
        [(99, "", "xx", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = selection.dsir_logweights(
        docs.unionByName(empty), docs.filter(F.col("lang") == "en"), n_buckets=B
    ).filter(F.col("doc_id") == 99).collect()
    assert r[0].n_grams == 0 and r[0].log_weight == 0.0
    with pytest.raises(ValueError):
        selection.dsir_logweights(docs, docs, n_buckets=0)
    with pytest.raises(ValueError):
        selection.dsir_logweights(docs, docs, add_k=0.0)


def test_dsir_select_gumbel_topk(docs):
    rows = [(r.doc_id, r.text, r.lang) for r in docs.collect()]
    w = {i: round(lw, 6) for i, (_, lw) in _py_dsir(rows).items()}
    keyed = []
    for i, lw in w.items():
        u = (_bucket(i, "dsir", 1 << 32) + 0.5) / float(1 << 32)
        g = round(-math.log(-math.log(u)), 6)
        keyed.append((round(lw + g, 6), i, lw, g))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    got = selection.dsir_select(
        docs, docs.filter(F.col("lang") == "en"), k=10, n_buckets=B
    ).collect()
    assert [r.rank for r in sorted(got, key=lambda r: r.rank)] == list(range(1, 11))
    want_ids = [i for _, i, _, _ in keyed[:10]]
    assert sorted(r.doc_id for r in got) == sorted(want_ids)
    for r in got:
        assert abs(r.sel_key - keyed[r.rank - 1][0]) < 2e-6
    # salted redraw selects a different (deterministic) subset
    other = selection.dsir_select(
        docs, docs.filter(F.col("lang") == "en"), k=10, n_buckets=B, salt="fold2"
    ).collect()
    assert sorted(r.doc_id for r in other) != sorted(r.doc_id for r in got)
    again = selection.dsir_select(
        docs, docs.filter(F.col("lang") == "en"), k=10, n_buckets=B
    ).collect()
    assert sorted((r.rank, r.doc_id) for r in again) == sorted(
        (r.rank, r.doc_id) for r in got
    )
    with pytest.raises(ValueError):
        selection.dsir_select(docs, docs, k=0)


def _brute_counts(docs):
    c = Counter()
    for r in docs.collect():
        for t in r.text.lower().split():
            if t:
                c[t] += 1
    return c


@pytest.mark.parametrize("depth,width", [(4, 128), (1, 8), (2, 1)])
def test_heavy_hitters_exact_regardless_of_sketch(docs, depth, width):
    """Output == HAVING count(*) >= T for ANY depth/width — the sketch only
    narrows (CMS never underestimates); width=1 (total collision) and the
    d>1/d=1 code paths must all stay exact."""
    counts = _brute_counts(docs)
    thr = sorted(counts.values())[len(counts) // 2]  # median → both sides hit
    got = {
        r.term: r.n
        for r in selection.heavy_hitters(
            docs, threshold=thr, depth=depth, width=width
        ).collect()
    }
    want = {t: n for t, n in counts.items() if n >= thr}
    assert got == want
    assert 0 < len(want) < len(counts)


def test_heavy_hitters_args(docs):
    with pytest.raises(ValueError):
        selection.heavy_hitters(docs, threshold=0)
    with pytest.raises(ValueError):
        selection.heavy_hitters(docs, threshold=5, depth=0)


DIM, NP = 8, 3


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (i, [((i * 7 + j * 13) % 17 - 8) / 8.0 for j in range(DIM)], i % 3)
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


def _py_pairs(rows, n_anchors, k_pos, k_neg):
    planes = simsearch.hyperplanes(DIM, NP, 42)
    def bucket(v):
        return sum(
            1 << p
            for p, pl in enumerate(planes)
            if sum(a * b for a, b in zip(v, pl)) > 0
        )
    bk = {i: bucket(v) for i, v, _ in rows}
    lab = {i: l for i, _, l in rows}
    vec = {i: v for i, v, _ in rows}
    out = []
    for a, av, al in rows:
        if a >= n_anchors:
            continue
        cands = []
        for c, cv, cl in rows:
            if c == a or bk[c] != bk[a]:
                continue
            dot = sum(x * y for x, y in zip(cv, av))
            cos = round(
                dot
                / (
                    math.sqrt(sum(x * x for x in cv))
                    * math.sqrt(sum(x * x for x in av))
                ),
                6,
            )
            role = "positive" if cl == al else "negative"
            cands.append((role, cos if role == "positive" else -cos, c, cos, cl))
        for role, cap in (("positive", k_pos), ("negative", k_neg)):
            rs = sorted(
                [t for t in cands if t[0] == role], key=lambda t: (t[1], t[2])
            )[:cap]
            out.extend(
                (a, role, rank + 1, c, cos, cl)
                for rank, (_, _, c, cos, cl) in enumerate(rs)
            )
    return sorted(out)


def test_contrastive_pairs_matches_pure_python(vecs):
    rows = [(r.vec_id, list(r.embedding), r.label) for r in vecs.collect()]
    anchors = vecs.filter(F.col("vec_id") < 6)
    got = sorted(
        (r.anchor_id, r.role, r.rank, r.vec_id, r.cosine, r.label)
        for r in simsearch.mine_contrastive_pairs(
            vecs, anchors, dim=DIM, k_pos=2, k_neg=3, n_planes=NP
        ).collect()
    )
    want = _py_pairs(rows, n_anchors=6, k_pos=2, k_neg=3)
    assert [(t[0], t[1], t[2], t[3], t[5]) for t in got] == [
        (t[0], t[1], t[2], t[3], t[5]) for t in want
    ]
    for g, w in zip(got, want):
        assert abs(g[4] - w[4]) < 2e-6


def test_contrastive_pairs_roles_and_exclusions(vecs):
    lab = {r.vec_id: r.label for r in vecs.collect()}
    anchors = vecs.filter(F.col("vec_id") < 6)
    res = simsearch.mine_contrastive_pairs(
        vecs, anchors, dim=DIM, k_pos=2, k_neg=3, n_planes=NP
    ).collect()
    assert res, "LSH buckets left no candidates at all"
    for r in res:
        assert r.vec_id != r.anchor_id
        same = lab[r.vec_id] == lab[r.anchor_id]
        assert (r.role == "positive") == same
        assert r.rank <= (2 if r.role == "positive" else 3)
    with pytest.raises(ValueError):
        simsearch.mine_contrastive_pairs(vecs, anchors, dim=DIM, k_pos=0, k_neg=0)


def test_bloom_semijoin_exact_regardless_of_params(docs, spark):
    """Output == plain semi-join for ANY n_bits/n_hashes — Bloom never
    false-negatives; tiny n_bits (total collision → everything passes the
    prune) must still be exact after the confirm join."""
    keys = docs.filter(F.col("doc_id") % 7 == 3).select("doc_id")
    want = sorted(
        r.doc_id for r in docs.join(keys, "doc_id", "left_semi").collect()
    )
    for n_bits, n_hashes in [(1 << 12, 3), (4, 1), (64, 5)]:
        got = sorted(
            r.doc_id
            for r in selection.bloom_semijoin(
                docs, keys, key_col="doc_id", n_bits=n_bits, n_hashes=n_hashes
            ).collect()
        )
        assert got == want, (n_bits, n_hashes)
    assert 0 < len(want) < docs.count()


def test_bloom_semijoin_prunes_and_keeps_schema(docs, spark):
    keys = docs.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("k")
    )
    out = selection.bloom_semijoin(
        docs, keys, key_col="doc_id", keys_key_col="k", n_bits=1 << 14, n_hashes=4
    )
    assert out.columns == docs.columns  # semi-join: probe schema untouched
    assert sorted(r.doc_id for r in out.collect()) == [0, 1, 2, 3, 4]
    with pytest.raises(ValueError):
        selection.bloom_semijoin(docs, keys, key_col="doc_id", n_bits=0)
