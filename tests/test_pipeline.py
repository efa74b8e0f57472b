"""Training-data pipeline ops: behavioral pins on crafted inputs (the
DuckDB-oracle equivalence runs in scripts/check_oracles.py + driver)."""

import pytest
from pyspark.sql import functions as F

from tiny_search_engine_spark.pipeline import dedup, simsearch, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox leaps over the lazy dog"),  # near dup
        (4, "completely different content about spark engines"),
        (5, "der schnelle braune fuchs und die katze ist das"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dup(docs):
    g = {r["fingerprint"]: r for r in dedup.exact_dup_groups(docs).collect()}
    sizes = sorted(r["n_docs"] for r in g.values())
    assert sizes == [1, 1, 1, 2]
    dup = [r for r in g.values() if r["n_docs"] == 2][0]
    assert dup["keep_id"] == 1


def test_minhash_identical_docs_identical_sigs(docs):
    sigs = {r["doc_id"]: (r["mh_0"], r["mh_1"]) for r in dedup.minhash_signatures(docs, num_hashes=2).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]


def test_lsh_finds_near_dup(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.lsh_candidate_pairs(docs, num_hashes=8, bands=4).collect()}
    assert (1, 2) in pairs  # exact dup always collides
    assert all(a < b for a, b in pairs)


def test_ngram_jaccard(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, shingle=1, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert pairs[(1, 3)] > 0.7  # one word differs
    assert (1, 4) not in pairs


def test_ngram_jaccard_hot_shingle_cap(spark):
    """One shingle present in EVERY doc (the '#include <stdio.h>' case):
    the capped variant must drop it from both numerator and denominator,
    matching a pure-Python capped Jaccard, and the join size stays
    bounded by the cap instead of O(n_docs²)."""
    rows = [(i, f"common alpha{i} beta{i % 2}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cap = 10  # "common" (df=40) and "beta0/1" (df=20) are hot; alpha_i (df=1) survive

    got = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(
            df, shingle=1, threshold=0.0, max_shingle_df=cap
        ).collect()
    }
    # pure-Python oracle over the capped universe
    toks = {i: {"common", f"alpha{i}", f"beta{i % 2}"} for i in range(40)}
    from collections import Counter

    sdf = Counter(t for s in toks.values() for t in s)
    capped = {i: {t for t in s if sdf[t] <= cap} for i, s in toks.items()}
    want = {}
    for a in range(40):
        for b in range(a + 1, 40):
            inter = len(capped[a] & capped[b])
            if inter:
                want[(a, b)] = (inter, round(inter / len(capped[a] | capped[b]), 6))
    assert got == want
    # every surviving shingle is unique to one doc here -> no pairs at all
    assert got == {}

    # uncapped control: the universal shingle makes all C(40,2) pairs
    uncapped = dedup.ngram_jaccard_pairs(df, shingle=1, threshold=0.0).count()
    assert uncapped == 40 * 39 // 2


def test_ngram_jaccard_cap_preserves_true_pairs(docs):
    """With a cap high enough to only kill corpus-wide boilerplate, the
    genuinely similar pairs keep their (capped-universe) Jaccard."""
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, shingle=1, threshold=0.5, max_shingle_df=3
        ).collect()
    }
    assert pairs[(1, 2)] == 1.0  # exact dups stay 1.0 in any sub-universe
    assert pairs[(1, 3)] > 0.7


def test_simhash_identical_and_near(docs):
    s = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert s[1] == s[2]
    ham_near = bin((s[1] ^ s[3]) & 0xFFFFFFFF).count("1")
    ham_far = bin((s[1] ^ s[4]) & 0xFFFFFFFF).count("1")
    assert ham_near < ham_far


def test_knn_self_is_top1(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(16).astype("float32").tolist()) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_vec_id"), "embedding")
    top = simsearch.knn_cosine(emb, q, k=3).filter(F.col("rank") == 1).collect()
    for r in top:
        assert r["vec_id"] == r["query_vec_id"]
        assert abs(r["cosine"] - 1.0) < 1e-5


def test_knn_lsh_recall(spark):
    import numpy as np

    rng = np.random.default_rng(4)
    rows = [(i, rng.standard_normal(16).astype("float32").tolist()) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_vec_id"), "embedding")
    exact = simsearch.knn_cosine(emb, q, k=5)
    approx = simsearch.knn_lsh(emb, q, dim=16, k=5, n_planes=4)
    rec = simsearch.ann_recall(exact, approx)
    # 4 planes → 16 buckets over 200 vecs; self always in own bucket
    assert rec > 0.2
    # the query vector itself must always be retrievable (same bucket)
    self_hits = approx.filter(F.col("vec_id") == F.col("query_vec_id")).count()
    assert self_hits == 10


def test_lang_id_markers(docs):
    out = {r["doc_id"]: r["lang_pred"] for r in textstats.lang_id(docs).collect()}
    assert out[1] == "en"
    assert out[5] == "de"


def test_fingerprint_normalization(spark):
    rows = [(1, "Hello   World"), (2, "hello world"), (3, "world hello")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = {r["doc_id"]: (r["fp_norm"], r["fp_bag"]) for r in textstats.fingerprint(df).collect()}
    assert fp[1][0] == fp[2][0]  # case+whitespace-insensitive
    assert fp[2][0] != fp[3][0]  # order matters for fp_norm
    assert fp[2][1] == fp[3][1]  # but not for the bag fingerprint


def test_quality_and_token_count(docs):
    q = {r["doc_id"]: r for r in textstats.quality_score(docs).collect()}
    assert q[1]["n_tokens"] == 9
    assert q[1]["stopword_ratio"] > 0
    tc = {r["doc_id"]: r for r in textstats.token_count(docs).collect()}
    assert tc[1]["n_ws_tokens"] == 9
    assert tc[1]["n_bpe_tokens"] == 9


def test_knn_ivf_full_probe_equals_exact(spark):
    """IVF with n_probe == n_centroids searches every inverted list →
    must equal the brute-force result exactly (same rounding, same
    tiebreaks); partial probe keeps the self-hit (a query's own vector
    lives in its top-1 centroid list)."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [(i, rng.standard_normal(16).astype("float32").tolist()) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("query_vec_id"), "embedding")
    exact = simsearch.knn_cosine(emb, q, k=5)
    full = simsearch.knn_ivf(emb, q, k=5, n_centroids=6, n_probe=6)
    e = sorted(map(tuple, exact.collect()))
    f = sorted(map(tuple, full.collect()))
    assert e == f
    part = simsearch.knn_ivf(emb, q, k=5, n_centroids=6, n_probe=2)
    assert part.filter(F.col("vec_id") == F.col("query_vec_id")).count() == 8
    assert simsearch.ann_recall(exact, part) > 0.3


def test_ivf_kmeans_codebook_beats_lowest_id(spark):
    """The real codebook: spherical k-means centroids give strictly better
    recall than the lowest-id stand-in when the low ids are NOT spread
    across clusters (here ids 0-29 all live in cluster 0, so the stand-in
    wastes its 6 lists on one cluster). Deterministic: seeded sample,
    seeded k-means++, fixed data."""
    import numpy as np

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((6, 16)) * 4
    rows = [
        (i, (centers[i // 30] + rng.standard_normal(16) * 0.5).astype("float32").tolist())
        for i in range(180)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") % 15 == 0).select(
        F.col("vec_id").alias("query_vec_id"), "embedding"
    )
    exact = simsearch.knn_cosine(emb, q, k=5)
    low = simsearch.knn_ivf(emb, q, k=5, n_centroids=6, n_probe=1)
    km = simsearch.knn_ivf(emb, q, k=5, n_centroids=6, n_probe=1, codebook="kmeans")
    r_low = simsearch.ann_recall(exact, low)
    r_km = simsearch.ann_recall(exact, km)
    assert r_km == 1.0
    assert r_low < 0.8  # the stand-in genuinely suffers here
    # determinism: same seed -> identical codebook
    c1 = simsearch.ivf_centroids_kmeans(emb, 6, seed=7)
    c2 = simsearch.ivf_centroids_kmeans(emb, 6, seed=7)
    assert c1 == c2


def test_routing_cols_matches_arrow_udf(spark):
    """The pure-codegen routing twin (_top_centroids_cols, used by the
    registry entries so their plans carry no Python eval) must agree
    with the Arrow matmul UDF on every vector — same 6-dp cosine
    rounding, same lowest-cid tie rule, including the ±0.0 edge (the
    0.0−cos normalization) and the zero-vector guard. Fuzzed over
    random vectors plus crafted ties/zeros, and end-to-end: knn_ivf with
    routing='cols' equals routing='arrow' row for row."""
    import numpy as np

    rng = np.random.default_rng(17)
    rows = [(i, rng.standard_normal(8).astype("float32").tolist()) for i in range(60)]
    rows += [
        (100, [0.0] * 8),                                   # zero vector
        (101, [1.0] + [0.0] * 7),                           # axis-aligned
        (102, [-1.0] + [0.0] * 7),                          # anti-aligned
        (103, [0.0, 1.0] + [0.0] * 6),                      # orthogonal
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for codebook in ("lowest_id", "kmeans"):
        if codebook == "kmeans":
            cents = simsearch.ivf_centroids_kmeans(emb, 4, seed=7)
        else:
            cents = simsearch.ivf_centroids(emb, 4)
        udf = simsearch._top_centroids_udf(cents, 3)
        got_u = {
            r["vec_id"]: r["t"]
            for r in emb.select("vec_id", udf(F.col("embedding")).alias("t")).collect()
        }
        got_c = {
            r["vec_id"]: r["t"]
            for r in emb.select(
                "vec_id",
                simsearch._top_centroids_cols(cents, 3, F.col("embedding")).alias("t"),
            ).collect()
        }
        assert got_u == got_c, codebook
    # end-to-end minus the zero vector: knn_ivf's exact rerank divides by
    # the corpus norm (a zero vector is undefined under cosine — both
    # routings would raise identically; the router itself guards it above)
    emb_nz = emb.filter(F.col("vec_id") != 100)
    q = emb_nz.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_vec_id"), "embedding"
    )

    def strip(df):
        return sorted(
            (r["query_vec_id"], r["rank"], r["vec_id"], r["cosine"])
            for r in df.collect()
        )

    assert strip(
        simsearch.knn_ivf(emb_nz, q, k=5, n_centroids=4, routing="cols")
    ) == strip(simsearch.knn_ivf(emb_nz, q, k=5, n_centroids=4, routing="arrow"))
    with pytest.raises(ValueError):
        simsearch.knn_ivf(emb, q, routing="nope")


def test_ivfpq_residual_beats_unit_encoding(spark):
    """encode='residual' (the paper's actual IVFADC: per-list codebooks
    over unit(x)−centroid residuals) must beat the SQL-oracle-friendly
    unit-vector quantization at EQUAL m/n_codes/n_probe on clustered
    data — the residual's dynamic range is the within-list spread, so
    the same code budget buys finer cells. Deterministic fixture,
    deterministic training (seeded sample/k-means, indexed ties)."""
    import numpy as np

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((8, 32)) * 3
    rows = [
        (i, (centers[i % 8] + rng.standard_normal(32) * 0.4).astype("float32").tolist())
        for i in range(400)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_vec_id"), "embedding"
    )
    exact = simsearch.knn_cosine(emb, q, k=10)
    kw = dict(dim=32, k=10, m=4, n_codes=8, n_centroids=8, n_probe=2,
              codebook="kmeans")
    r_unit = simsearch.ann_recall(exact, simsearch.knn_ivfpq(emb, q, encode="unit", **kw))
    r_res = simsearch.ann_recall(exact, simsearch.knn_ivfpq(emb, q, encode="residual", **kw))
    assert r_res > r_unit, (r_res, r_unit)
    assert r_res >= 0.9, r_res  # measured 0.94 vs 0.67 on this fixture
    with pytest.raises(ValueError):
        simsearch.knn_ivfpq(emb, q, encode="nope", **kw)


def test_kmeans_oracle_centroids_match_spark_training(spark, monkeypatch):
    """The knn_ivf_kmeans value oracle retrains the codebook OUTSIDE
    Spark (__spark_entry__._kmeans_centroid_literals: python-xxhash64
    sample + shared simsearch.kmeans_codebook) and inlines it as SQL
    literals. Pin that the out-of-Spark reconstruction is bit-identical
    to the engine's ivf_centroids_kmeans on the same parquet — the only
    parity that makes the oracle sound."""
    import importlib.util
    import os

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        pytest.skip("driver testdata absent")
    # oracle generation pins to the compare sf via TSE_ORACLE_SF_DIR
    # (ADVICE r4: no cross-sf fallback)
    monkeypatch.setenv("TSE_ORACLE_SF_DIR", sf_dir)
    spec = importlib.util.spec_from_file_location(
        "spark_entry_for_test", "/root/repo/__spark_entry__.py"
    )
    se = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(se)
    lits = se._kmeans_centroid_literals()
    assert lits is not None
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    want = simsearch.ivf_centroids_kmeans(emb, se.IVF_CENTROIDS, seed=42)
    assert [cid for cid, _ in lits] == [cid for cid, _ in want]
    for (_, lv), (_, wv) in zip(lits, want):
        assert lv == wv  # bit-identical float64s, not approx
    # same discipline for the residual per-list PQ codebooks backing the
    # knn_ivfpq_residual value oracle
    tr = se._trained_oracle_literals()
    assert tr is not None and tr[1] is not None
    cents, rcbs, dim = tr
    want_rcbs = simsearch.residual_codebooks(
        emb, want, dim, m=se.PQ_M, n_codes=se.PQ_CODES, seed=42
    )
    assert set(rcbs) == set(want_rcbs)
    for cid in want_rcbs:
        assert rcbs[cid] == want_rcbs[cid]  # bit-identical


def test_ivf_assign_is_argmax(spark):
    import numpy as np

    rng = np.random.default_rng(6)
    rows = [(i, rng.standard_normal(8).astype("float32").tolist()) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = simsearch.ivf_centroids(emb, 4)
    got = {r["vec_id"]: r["centroid_id"] for r in simsearch.ivf_assign(emb, cents).collect()}
    vecs = {i: np.array(v, dtype=np.float64) for i, v in rows}
    for vid, v in vecs.items():
        cos = []
        for cid, cv in cents:
            c = np.array(cv, dtype=np.float64)
            cos.append((round(float(v @ c / (np.linalg.norm(v) * np.linalg.norm(c))), 6), cid))
        best = min(cos, key=lambda t: (-t[0], t[1]))[1]
        assert got[vid] == best, vid


def test_synonym_expand_matches_dict(spark):
    """The distributed C2 (synonym_expand) equals the driver-side
    SynonymDict.get per term: same candidates, same order, same cap."""
    from tiny_search_engine_spark.query import SynonymDict, synonym_expand
    from tiny_search_engine_spark.tokenizer import tokenize

    clusters = [
        ["merge", "join", "combine", "mergesort"],
        ["fast", "quick", "rapid", "fa"],
        ["data", "dataset", "database", "dat"],
        ["join", "weld"],  # 'join' already in cluster 0 → first wins
    ]
    queries = [(0, "merge the data"), (1, "fast join"), (2, "data data"), (3, "unknown")]
    got = {}
    for r in synonym_expand(spark, queries, clusters, mode="ws").collect():
        got.setdefault((r["query_id"], r["term_idx"]), []).append((r["syn_rank"], r["syn"]))
    sd = SynonymDict(clusters)
    for qid, q in queries:
        for i, t in enumerate(tokenize(q, "ws")):
            want = [s for s in sd.get(t.term) if s.lower() != t.term.lower()][:10]
            have = [s for _, s in sorted(got.get((qid, i), []))]
            assert have == want, (qid, i, t.term, have, want)


def test_embedding_neardup_lsh_recall(spark):
    """LSH-banded near-dup (the 100 TB shape) vs the brute-force path:
    exact precision (pairs are a subset with identical cosines), high
    recall at the default 6-plane x 4-band config, and no cross join in
    the plan."""
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.standard_normal((120, 16)).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(120)]
    # plant near-dups: jittered copies, cosine ~0.99
    for j in range(40):
        v = base[j] + 0.05 * rng.standard_normal(16).astype("float32")
        rows.append((1000 + j, v.astype("float32").tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    brute = {(r.id_a, r.id_b): r.cosine
             for r in dedup.embedding_neardup_pairs(emb, threshold=0.9).collect()}
    lsh = {(r.id_a, r.id_b): r.cosine
           for r in dedup.embedding_neardup_pairs_lsh(emb, dim=16, threshold=0.9).collect()}
    assert set(lsh) <= set(brute)  # exact cosine filter -> no false positives
    for k in lsh:
        assert lsh[k] == brute[k]
    assert len(brute) >= 40
    assert len(lsh) / len(brute) >= 0.85  # banded recall (deterministic seeds)

    plan = dedup.embedding_neardup_pairs_lsh(emb, dim=16)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_simhash_pairs_exact_vs_brute(spark):
    """Banded simhash candidate join must find EXACTLY the pairs a brute
    cross-join finds at hamming <= 3 (pigeonhole: 3 < 4 bands)."""
    from itertools import combinations

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
        (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (4, "completely different words about spark engines here"),
        (5, "unrelated content entirely separate vocabulary tokens"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r.doc_id: r.simhash for r in dedup.simhash(df).collect()}
    brute = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a, b in combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {(r.id_a, r.id_b, r.hamming) for r in dedup.simhash_pairs(df).collect()}
    assert got == brute
    assert (1, 3, 0) in got  # exact dup at hamming 0
    plan = dedup.simhash_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_resolve_clusters_transitive(spark):
    # chain 1-2, 2-3 plus isolated edge 10-11: components {1,2,3}, {10,11}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup.resolve_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_resolve_clusters_matches_union_find(spark):
    # random-ish graph vs a pure-python union-find
    import random

    rng = random.Random(42)
    edges = sorted({tuple(sorted(rng.sample(range(60), 2))) for _ in range(45)})
    parent = list(range(60))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    expect = {n: find(n) for n in nodes}
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in dedup.resolve_clusters(pairs).collect()}
    assert got == expect


def test_dedup_documents_keeps_canonical(docs):
    pairs = dedup.lsh_candidate_pairs(docs, num_hashes=8, bands=4)
    kept = {r["doc_id"] for r in dedup.dedup_documents(docs, pairs).collect()}
    assert 1 in kept and 2 not in kept  # exact dups 1,2 -> keep min id
    assert 4 in kept and 5 in kept


def test_curate_quality_gate_dedup_and_cap(docs):
    out = textstats.curate(docs, min_quality=0.0, per_lang_cap=1).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang_pred"], []).append(r)
    # cap: at most 1 doc per language
    assert all(len(v) == 1 for v in by_lang.values())
    ids = {r["doc_id"] for r in out}
    assert not ({1, 2} <= ids)  # exact-normalized dups collapsed
    # quality gate: a high threshold drops everything
    assert textstats.curate(docs, min_quality=2.0).count() == 0
    # uncapped output carries no lang_rank (no global ranking performed)
    assert "lang_rank" not in textstats.curate(docs, min_quality=0.0).columns


def test_curate_plan_has_partial_window_limit(docs):
    """Scale pin: the per-language cap must be planned as a two-phase
    top-k — Catalyst's rank-limit pushdown (WindowGroupLimit Partial)
    prunes each map task to ≤ cap rows per language BEFORE the exchange,
    so a hot language never funnels its raw rows through one reducer.
    If a Spark upgrade or a query rewrite loses this, fail loudly."""
    plan = (
        textstats.curate(docs, min_quality=0.0, per_lang_cap=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    lines = plan.splitlines()
    partial = [i for i, l in enumerate(lines)
               if "WindowGroupLimit [lang_pred" in l and "Partial" in l]
    exchange = [i for i, l in enumerate(lines)
                if "Exchange hashpartitioning(lang_pred" in l]
    assert partial and exchange, plan
    # deeper in the tree (= earlier in execution) than the exchange
    assert min(exchange) < max(partial), plan


def test_resolve_clusters_long_chain(spark):
    """A 2000-node path graph (diameter 1999) must converge — pointer
    jumping makes rounds ~ log2(diameter), and plain min-propagation
    would silently hit the round cap and split the cluster."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1999)], "id_a long, id_b long"
    )
    out = dedup.resolve_clusters(pairs)
    labels = {r["cluster_id"] for r in out.collect()}
    assert labels == {0}
    assert out.count() == 2000


def test_corpus_profile_exact_and_sketch(spark):
    rows = [
        (1, "a b c a", "en"),
        (2, "a b", "en"),
        (3, "x y z", "de"),
        (4, "x x", "de"),
        (5, "q", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    from tiny_search_engine_spark.pipeline import textstats as ts

    exact = {r.lang: r for r in ts.corpus_profile(df).collect()}
    assert (exact["en"].n_docs, exact["en"].n_tokens, exact["en"].n_terms) == (2, 6, 3)
    assert exact["en"].avg_doc_len == 3.0
    assert (exact["de"].n_docs, exact["de"].n_tokens, exact["de"].n_terms) == (2, 5, 3)
    assert (exact["fr"].n_docs, exact["fr"].n_tokens, exact["fr"].n_terms) == (1, 1, 1)

    # HLL sketch twin: same shape, bounded relative error (rsd 2%,
    # generous 10% gate for tiny groups)
    approx = {r.lang: r for r in ts.corpus_profile(df, approx=True).collect()}
    assert set(approx) == set(exact)
    for lang, e in exact.items():
        a = approx[lang]
        assert abs(a.n_docs - e.n_docs) <= max(1, 0.1 * e.n_docs)
        assert abs(a.n_terms - e.n_terms) <= max(1, 0.1 * e.n_terms)
        assert a.n_tokens == e.n_tokens  # plain count is exact in both


def _brute_rep(text, n):
    toks = [t for t in text.lower().split() if t]
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)] if len(toks) >= n else []
    t = len(grams)
    if t == 0:
        return 0.0, 0.0
    from collections import Counter

    c = Counter(grams)
    return round((t - len(c)) / t, 6), round(max(c.values()) / t, 6)


def test_repetition_stats_brute(spark):
    rows = [
        (1, "a b a b a b a b"),          # heavy 2-gram repetition
        (2, "x y z w v u"),              # all distinct
        (3, "one"),                      # shorter than every n
        (4, "loop loop loop loop loop"), # one dominant gram
        (5, "The the THE the mix Mix"),  # case folding
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in textstats.repetition_stats(df).collect()}
    for doc_id, text in rows:
        for n in (2, 3):
            dup, top = _brute_rep(text, n)
            assert got[doc_id][f"dup_{n}gram_frac"] == pytest.approx(dup), (doc_id, n)
            assert got[doc_id][f"top_{n}gram_frac"] == pytest.approx(top), (doc_id, n)
    assert got[3]["dup_2gram_frac"] == 0.0 and got[3]["top_2gram_frac"] == 0.0
    assert got[1]["dup_2gram_frac"] > 0.7  # "a b" x4 + "b a" x3


def test_decontaminate_brute(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),   # shares "alpha beta gamma"
            (2, "zeta eta theta iota kappa"),        # no overlap
            (3, "alpha beta gamma alpha beta gamma"),  # dup grams count once
            (4, "aa bb"),                             # too short for n=3
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma prime"), (101, "unrelated eval text here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textstats.decontaminate(train, ev, n=3, threshold=0.3).collect()}
    assert set(got) == {1, 2, 3, 4}
    # doc 1: grams {abc, bcd, cde}; eval has {abg? ...} -> "alpha beta gamma" + "beta gamma prime"
    assert got[1]["n_grams"] == 3 and got[1]["n_overlap"] == 1
    assert got[1]["overlap_frac"] == pytest.approx(round(1 / 3, 6))
    assert got[1]["contaminated"] is True
    assert got[2]["n_overlap"] == 0 and got[2]["contaminated"] is False
    # doc 3 distinct grams: {abg, bga, gab} -> only "alpha beta gamma" overlaps
    assert got[3]["n_grams"] == 3 and got[3]["n_overlap"] == 1
    assert got[4]["n_grams"] == 0 and got[4]["overlap_frac"] == 0.0
    assert got[4]["contaminated"] is False


def test_decontaminate_fuzzy_brute(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),      # near-copy of eval 100
            (2, "zeta eta theta iota kappa"),           # no overlap at all
            (3, "alpha beta gamma prime"),              # EXACT copy of eval 100
            (4, "aa bb"),                               # too short for n=3
            (5, "alpha beta gamma unrelated eval text"),  # ties two evals? grams vs both
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma prime"), (101, "unrelated eval text here")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in textstats.decontaminate_fuzzy(train, ev, n=3, threshold=0.5).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}
    # eval 100 grams: {abg, bgp}; eval 101 grams: {uet, eth}
    # doc 1 grams {abg, bgd, gde}: inter 1 with ev100 -> 1/(3+2-1)
    assert got[1]["max_jaccard"] == pytest.approx(round(1 / 4, 6))
    assert got[1]["eval_id"] == 100 and got[1]["contaminated"] is False
    # doc 2: no shared gram with any eval -> no pair row at all
    assert got[2]["max_jaccard"] == 0.0
    assert got[2]["eval_id"] is None and got[2]["contaminated"] is False
    # doc 3 == eval 100 verbatim -> Jaccard 1.0
    assert got[3]["max_jaccard"] == 1.0
    assert got[3]["eval_id"] == 100 and got[3]["contaminated"] is True
    # doc 4: zero grams -> kept with 0.0
    assert got[4]["n_grams"] == 0 and got[4]["max_jaccard"] == 0.0
    # doc 5 grams {abg, bgu, gue, uet}: ev100 inter {abg} -> 1/5,
    # ev101 inter {uet} -> 1/5 — tie breaks to the SMALLEST eval id
    assert got[5]["max_jaccard"] == pytest.approx(round(1 / 5, 6))
    assert got[5]["eval_id"] == 100


def test_paragraph_dedup_modes(spark):
    rows = [
        (1, "header\nalpha\nbeta"),
        (2, "header\ngamma"),
        (3, "unique only"),
        (4, "header\nheader\ndelta"),
        (5, "header"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rep = {r["doc_id"]: r for r in dedup.paragraph_dedup(df, mode="drop_repeated").collect()}
    assert rep[1]["text"] == "header\nalpha\nbeta" and rep[1]["n_kept"] == 3
    assert rep[2]["text"] == "gamma" and rep[2]["n_paras"] == 2 and rep[2]["n_kept"] == 1
    assert rep[3]["text"] == "unique only"
    assert rep[4]["text"] == "delta" and rep[4]["n_paras"] == 3  # intra-doc repeat cut too
    assert rep[5]["text"] == "" and rep[5]["n_kept"] == 0        # all-boilerplate doc kept as a row
    boil = {r["doc_id"]: r for r in dedup.paragraph_dedup(df, mode="drop_boilerplate", max_df=1).collect()}
    assert boil[1]["text"] == "alpha\nbeta"   # header df=4 > 1: cut everywhere
    assert boil[3]["text"] == "unique only"
    with pytest.raises(ValueError):
        dedup.paragraph_dedup(df, mode="nope")


def test_paragraph_dedup_partitioning_invariant(spark):
    rows = [(i, f"shared line\nuniq {i}\n" + ("tail" if i % 3 else "shared line")) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, dedup.paragraph_dedup(df).collect()))
    b = sorted(map(tuple, dedup.paragraph_dedup(df.repartition(13)).collect()))
    assert a == b
    # exactly one 'shared line' survives corpus-wide
    kept_shared = sum(r[1].count("shared line") for r in a)
    assert kept_shared == 1


# ---------------------------------------------------------------------------
# lm_perplexity (CCNet-style bigram LM quality filter)


def test_lm_perplexity_brute(spark):
    import math

    rows = [
        (0, "the cat sat on the mat the cat sat on the mat"),
        (1, "a completely different sentence with no repeats at all"),
        (2, "the cat sat on the mat and then left quickly"),
        (3, "one"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uni, bi = {}, {}
    for _, t in rows:
        ws = t.lower().split()
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for g in zip(ws, ws[1:]):
            bi[g] = bi.get(g, 0) + 1
    V = len(uni)
    exp = {}
    for d, t in rows:
        ws = t.lower().split()
        bgs = list(zip(ws, ws[1:]))
        if not bgs:
            exp[d] = (0, 0.0, 1.0)
            continue
        ll = sum(
            math.log((bi.get(g, 0) + 1.0) / (uni.get(g[0], 0) + 1.0 * V)) for g in bgs
        )
        h = -ll / len(bgs)
        exp[d] = (len(bgs), round(h, 6), round(math.exp(h), 6))

    got = {
        r["doc_id"]: (r["n_bigrams"], r["logloss"], r["ppl"])
        for r in textstats.lm_perplexity(df).collect()
    }
    assert got == exp
    # a doc made of the corpus's most common transitions scores LOWER
    # perplexity than the no-repeat doc
    assert got[0][2] < got[1][2]


def test_lm_perplexity_ref_corpus_and_min_count(spark):
    """OOV scoring against a separate reference corpus + tail pruning."""
    ref = spark.createDataFrame(
        [(100, "spark engine " * 50 + "rare pair")], "doc_id long, text string"
    )
    df = spark.createDataFrame(
        [(0, "spark engine spark engine"), (1, "rare pair"), (2, "totally oov words")],
        "doc_id long, text string",
    )
    full = {r["doc_id"]: r for r in textstats.lm_perplexity(df, ref_df=ref).collect()}
    # the common transition scores far better than pure-OOV text
    assert full[0]["ppl"] < full[2]["ppl"]
    # pruning the tail ("rare pair" seen once) pushes doc 1 toward the
    # unseen floor but cannot change doc 0 (its bigrams are hot)
    pruned = {
        r["doc_id"]: r
        for r in textstats.lm_perplexity(df, ref_df=ref, min_count=2).collect()
    }
    assert pruned[0]["ppl"] == full[0]["ppl"]
    assert pruned[1]["ppl"] > full[1]["ppl"]


# ---------------------------------------------------------------------------
# duplicate_spans (Lee et al. ExactSubstr, token granularity)


def _brute_spans(rows, window, min_occ=2):
    from collections import Counter

    cen = Counter()
    for _, t in rows:
        ws = t.lower().split()
        for i in range(len(ws) - window + 1):
            cen[" ".join(ws[i : i + window])] += 1
    out = set()
    for d, t in rows:
        ws = t.lower().split()
        dup = [
            i
            for i in range(len(ws) - window + 1)
            if cen[" ".join(ws[i : i + window])] >= min_occ
        ]
        spans = []
        for p in dup:
            if spans and p - spans[-1][2] <= window:
                spans[-1][1] = p + window
                spans[-1][2] = p
                spans[-1][3] += 1
            else:
                spans.append([p, p + window, p, 1])
        for s in spans:
            out.add((d, s[0], s[1], s[1] - s[0], s[3]))
    return out


def test_duplicate_spans_brute(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "prefix junk alpha beta gamma delta epsilon different tail here"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 0
        (3, "no shared content in this document at all whatsoever"),
        (4, "short"),
        (5, "self repeat self repeat self repeat self repeat self repeat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"], r["n_windows"])
        for r in dedup.duplicate_spans(df, window=3).collect()
    }
    assert got == _brute_spans(rows, 3)
    # doc 5's INTRA-doc repetition is caught (the Lee et al. rule counts
    # occurrences anywhere, including the same doc)
    assert any(d == 5 for d, *_ in got)
    # docs 0 and 2 are fully covered by one maximal span
    n_tok = 8
    assert (0, 0, n_tok, n_tok, n_tok - 2) in got


def test_duplicate_spans_gap_split(spark):
    """Two duplicated regions separated by unique text yield TWO spans."""
    a = "one two three four five"
    b = "six seven eight nine ten"
    rows = [
        (0, f"{a} UNIQUEA0 UNIQUEB0 UNIQUEC0 {b}"),
        (1, f"{a} UNIQUEA1 UNIQUEB1 UNIQUEC1 {b}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dedup.duplicate_spans(df, window=3).collect()
    }
    assert got == {(0, 0, 5), (0, 8, 13), (1, 0, 5), (1, 8, 13)}


def test_duplicate_spans_partitioning_invariance(spark):
    rows = [(i, f"common prefix text here unique{i} and a common suffix tail") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = dedup.duplicate_spans(df.repartition(2), window=3).collect()
    b = dedup.duplicate_spans(df.repartition(17), window=3).collect()
    key = lambda r: (r["doc_id"], r["span_start"])
    assert sorted(a, key=key) == sorted(b, key=key)
    assert {tuple(r) for r in a} == _brute_spans(rows, 3)


# ---------------------------------------------------------------------------
# knn_pq (product quantization + ADC, exact rerank)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_knn_pq_recall_and_kmeans_codebook(spark, emb):
    dim = len(emb.first()["embedding"])
    q = emb.filter(F.col("vec_id") % 37 == 0).limit(5).select(
        F.col("vec_id").alias("query_vec_id"), "embedding"
    )
    exact = simsearch.knn_cosine(emb, q, k=10)
    low = simsearch.knn_pq(emb, q, dim=dim, k=10, m=8, n_codes=16, refine=5)
    km = simsearch.knn_pq(
        emb, q, dim=dim, k=10, m=8, n_codes=16, refine=5, codebook="kmeans"
    )
    r_low = simsearch.ann_recall(exact, low)
    r_km = simsearch.ann_recall(exact, km)
    # the trained codebook beats the lowest-id stand-in, and clears a floor
    assert r_km > r_low
    assert r_km >= 0.6
    # rank-1 self-hit: every query vector is its own nearest neighbor and
    # survives any shortlist (ADC distance 0 to itself)
    self_hits = {
        (r["query_vec_id"], r["vec_id"]) for r in km.collect() if r["rank"] == 1
    }
    assert self_hits == {(i, i) for i, in q.select("query_vec_id").collect()}


def test_knn_ivfpq_recall_and_routing(spark, emb):
    """IVF-routed PQ (the IVFADC composition): full-probe IVFPQ must
    equal flat knn_pq exactly (routing only prunes — same codebooks,
    same ADC, same rerank); partial probe trades recall for scan
    volume but keeps a recall floor vs exact; kmeans codebooks beat the
    lowest-id stand-ins at the same probe budget."""
    dim = len(emb.first()["embedding"])
    q = emb.filter(F.col("vec_id") % 37 == 0).limit(5).select(
        F.col("vec_id").alias("query_vec_id"), "embedding"
    )
    flat = simsearch.knn_pq(emb, q, dim=dim, k=10, m=8, n_codes=16, refine=5)
    full = simsearch.knn_ivfpq(
        emb, q, dim=dim, k=10, m=8, n_codes=16, refine=5,
        n_centroids=6, n_probe=6,
    )
    assert sorted(map(tuple, flat.collect())) == sorted(map(tuple, full.collect()))
    exact = simsearch.knn_cosine(emb, q, k=10)
    part = simsearch.knn_ivfpq(
        emb, q, dim=dim, k=10, m=8, n_codes=16, refine=5,
        n_centroids=6, n_probe=3,
    )
    km = simsearch.knn_ivfpq(
        emb, q, dim=dim, k=10, m=8, n_codes=16, refine=5,
        n_centroids=6, n_probe=3, codebook="kmeans",
    )
    r_part = simsearch.ann_recall(exact, part)
    r_km = simsearch.ann_recall(exact, km)
    assert r_part >= 0.4
    assert r_km > r_part
    assert r_km >= 0.5  # measured 0.56 at probe 3/6 on sf0.001
    # a query's own vector sits in its top-1 probed list with ADC 0 —
    # the self-hit survives routing, the shortlist, and the rerank
    self_hits = {
        (r["query_vec_id"], r["vec_id"]) for r in km.collect() if r["rank"] == 1
    }
    assert self_hits == {(i, i) for i, in q.select("query_vec_id").collect()}


def test_pq_encode_codes_bounded_and_invariant(spark, emb):
    dim = len(emb.first()["embedding"])
    cbs = simsearch.pq_codebooks(emb, dim, m=4, n_codes=8)
    assert len(cbs) == 4 and len(cbs[0]) == 8 and len(cbs[0][0]) == dim // 4
    a = simsearch.pq_encode(emb.repartition(3), cbs).select("vec_id", "codes").collect()
    b = simsearch.pq_encode(emb.repartition(11), cbs).select("vec_id", "codes").collect()
    am = {r["vec_id"]: r["codes"] for r in a}
    bm = {r["vec_id"]: r["codes"] for r in b}
    assert am == bm
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in am.values())
    # the codebook's own vectors encode to themselves (distance 0)
    low_ids = sorted(am)[:8]
    for rank0, vid in enumerate(low_ids):
        assert am[vid] == [rank0] * 4


def test_pq_codebooks_validation(spark, emb):
    dim = len(emb.first()["embedding"])
    with pytest.raises(ValueError, match="not divisible"):
        simsearch.pq_codebooks(emb, dim, m=7)
    with pytest.raises(ValueError, match="unknown codebook method"):
        simsearch.pq_codebooks(emb, dim, m=4, method="nope")


def test_remove_duplicate_spans(spark):
    rows = [
        (0, "Alpha Beta Gamma Delta Epsilon zeta eta"),
        (1, "prefix Alpha Beta Gamma Delta Epsilon tail"),
        (2, "no shared content in this document at all"),
        (3, "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.remove_duplicate_spans(df, window=3).collect()}
    # the shared 5-token run is cut from BOTH docs (cut-all, the Lee et al.
    # tool's rule), original case preserved in the remainder
    assert out[0]["text"] == "zeta eta"
    assert out[1]["text"] == "prefix tail"
    assert (out[0]["n_tokens"], out[0]["n_removed"]) == (7, 5)
    assert (out[1]["n_tokens"], out[1]["n_removed"]) == (7, 5)
    # untouched docs come back whitespace-joined but otherwise identical
    assert out[2]["text"] == rows[2][1] and out[2]["n_removed"] == 0
    assert out[3]["text"] == "tiny" and out[3]["n_tokens"] == 1
    # a fully-duplicated doc becomes an empty row, not a dropped row
    dup_all = spark.createDataFrame(
        [(0, "x y z w v"), (1, "x y z w v")], "doc_id long, text string"
    )
    o2 = {r["doc_id"]: r for r in dedup.remove_duplicate_spans(dup_all, window=3).collect()}
    assert o2[0]["text"] == "" and o2[0]["n_removed"] == 5
    assert o2[1]["text"] == ""
    # NULL text follows the paragraph_dedup empty-row convention:
    # text='', counts 0 — never NULL text or a -1 legacy sizeOfNull
    with_null = spark.createDataFrame(
        [(0, "a b c a b c d"), (1, None)], "doc_id long, text string"
    )
    o3 = {r["doc_id"]: r for r in dedup.remove_duplicate_spans(with_null, window=3).collect()}
    assert o3[1]["text"] == ""
    assert (o3[1]["n_tokens"], o3[1]["n_removed"]) == (0, 0)


def test_lm_perplexity_rejects_zero_add_k(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="add_k"):
        textstats.lm_perplexity(df, add_k=0.0)


def test_semantic_dedup_brute(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, 12))
    vecs = {i: base[i] for i in range(40)}
    # planted near-duplicates: tiny perturbations of existing rows
    for i, src in [(40, 3), (41, 3), (42, 17), (43, 25)]:
        vecs[i] = vecs[src] + 1e-3 * rng.standard_normal(12)
    rows = [(i, v.astype("float32").tolist()) for i, v in sorted(vecs.items())]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r.vec_id: (r.centroid_id, r.is_kept, r.n_dup_witnesses)
        for r in simsearch.semantic_dedup(emb, n_clusters=4, threshold=0.9).collect()
    }
    # brute with the engine's exact tie/rounding rules (float32 storage,
    # double math, round-6 cosine, lowest-cid argmax tie)
    V = {i: np.asarray(v, dtype=np.float64) for i, v in rows}

    def cos(a, b):
        return round(
            float(V[a] @ V[b]) / (np.linalg.norm(V[a]) * np.linalg.norm(V[b])), 6
        )

    cids = [0, 1, 2, 3]
    assign = {
        i: max(cids, key=lambda c: (cos(i, c), -c))
        for i in V
    }
    want = {}
    for i in V:
        wit = [
            j for j in V
            if j < i and assign[j] == assign[i] and cos(i, j) >= 0.9
        ]
        want[i] = (assign[i], not wit, len(wit))
    assert out == want
    # the planted copies were caught and the originals kept
    assert not out[41][1] and not out[42][1] and not out[43][1]
    assert out[3][1] and out[17][1] and out[25][1]
    # 40 vs 3: same cluster, 40 is the lower-id copy... 3 < 40 so 40 drops
    assert not out[40][1]


def test_semantic_dedup_kmeans_codebook(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [(i, rng.standard_normal(8).astype("float32").tolist()) for i in range(60)]
    rows += [(60, rows[7][1]), (61, rows[9][1])]  # exact copies
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = simsearch.semantic_dedup(
        emb, n_clusters=4, threshold=0.99, codebook="kmeans"
    )
    got = {r.vec_id: r for r in out.collect()}
    assert len(got) == 62
    # exact copies land in the copied row's cluster and are dropped
    assert got[60].centroid_id == got[7].centroid_id and not got[60].is_kept
    assert got[61].centroid_id == got[9].centroid_id and not got[61].is_kept
    assert got[7].is_kept and got[9].is_kept
    # the lowest id of every cluster can have no lower-id witness
    lowest = {}
    for i, r in got.items():
        if r.centroid_id not in lowest or i < lowest[r.centroid_id]:
            lowest[r.centroid_id] = i
    assert all(got[i].is_kept for i in lowest.values())
    # the precomputed-assignments path (the 100 TB materialize-once shape)
    # is identical to the inline path
    cents = simsearch.ivf_centroids_kmeans(emb, 4, "vec_id", "embedding")
    pre = simsearch.ivf_assign(emb, cents)
    out2 = simsearch.semantic_dedup(emb, threshold=0.99, assignments=pre)
    assert {tuple(r) for r in out2.collect()} == {tuple(r) for r in out.collect()}


def test_vocab_coverage_brute_and_path_parity(spark):
    import re

    rows = [
        (0, "Table ROW scan zebra"),      # case-folding; 1 OOV
        (1, "x1 y2 (z)"),                 # all OOV; punct affects fertility
        (2, ""),                          # empty doc: zero rates, kept
        (3, "the the the"),               # all in-vocab
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = ["table", "row", "scan", "the"]
    list_out = {r.doc_id: r for r in textstats.vocab_coverage(df, vocab).collect()}
    vdf = spark.createDataFrame([(t,) for t in vocab], "term string")
    df_out = {r.doc_id: r for r in textstats.vocab_coverage(df, vdf).collect()}
    # brute
    for i, text in rows:
        toks = [t for t in text.lower().split() if t]
        n_bpe = len(re.findall(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]", text))
        n_oov = sum(1 for t in toks if t not in vocab)
        want = (
            len(toks),
            n_oov,
            round(n_oov / len(toks), 6) if toks else 0.0,
            round(n_bpe / len(toks), 6) if toks else 0.0,
        )
        for out in (list_out, df_out):
            got = out[i]
            assert (got.n_tokens, got.n_oov, got.oov_rate, got.fertility) == want, (i, got)
    # both plans, same answer (incl. the empty doc surviving the join path)
    assert {tuple(r) for r in list_out.values()} == {tuple(r) for r in df_out.values()}
    # literal pin: "x1 y2 (z)" -> pieces x,1,y,2,(,z,) = 7 over 3 ws tokens
    assert list_out[1].fertility == round(7 / 3, 6)
    assert list_out[1].n_oov == 3 and list_out[0].n_oov == 1


def test_vocab_coverage_list_path_is_shuffle_free(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    plan = textstats.vocab_coverage(df, ["a"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_doc_keyterms_brute(spark):
    import math

    rows = [
        (0, "spark spark table common"),
        (1, "duck pond common table"),
        (2, "spark duck common common"),
        (3, "zebra common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.rank): (r.term, r.tf, r.wei)
        for r in textstats.doc_keyterms(df, k=2, min_df=1).collect()
    }
    # brute tf-idf with the engine's rounding/tie rules
    toks = {i: t.split() for i, t in rows}
    dfreq: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            dfreq[t] = dfreq.get(t, 0) + 1
    want = {}
    for i, ts in toks.items():
        tf = {t: ts.count(t) for t in set(ts)}
        scored = sorted(
            (
                (round(c * math.log(len(rows) / dfreq[t]), 6), t, c)
                for t, c in tf.items()
            ),
            key=lambda x: (-x[0], x[1]),
        )
        for rank, (wei, t, c) in enumerate(scored[:2], 1):
            want[(i, rank)] = (t, c, wei)
    assert got == want
    # doc 0's signature term is spark (tf=2, df=2), never "common" (df=4, idf=0)
    assert got[(0, 1)][0] == "spark"
    # idf 0 terms (in every doc) still appear when nothing else is left
    assert got[(3, 1)][0] == "zebra" and got[(3, 2)] == ("common", 1, 0.0)
    # min_df prunes hapax: zebra (df=1) disappears, doc 3 keeps only common
    pruned = {
        (r.doc_id, r.rank): r.term
        for r in textstats.doc_keyterms(df, k=2, min_df=2).collect()
    }
    assert pruned[(3, 1)] == "common" and (3, 2) not in pruned


def _brute_normalize(t, form="NFC", lowercase=False):
    import re
    import unicodedata

    out = unicodedata.normalize(form, t)
    out = re.sub("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "", out)
    if lowercase:
        out = out.lower()
    out = re.sub(r"\s+", " ", out).strip()
    return out


def test_normalize_text_brute(spark):
    rows = [
        (1, "cafe\u0301 latte"),                # decomposed -> NFC recomposes
        (2, "tab\tand\nnewline   kept"),        # ws collapse
        (3, "ctrl\x01\x02 chars \x7f gone"),    # control strip (DEL too)
        (4, "  already clean  "),               # trim only
        (5, ""),                                # empty survives
        (6, "ＨＩ ﬁne"),           # fullwidth + ligature: NFC no-op, NFKC folds
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for form in ("NFC", "NFKC"):
        got = {r["doc_id"]: r for r in textstats.normalize_text(df, form=form).collect()}
        for doc_id, t in rows:
            exp = _brute_normalize(t, form)
            assert got[doc_id]["norm_text"] == exp, (form, doc_id)
            assert got[doc_id]["changed"] == (exp != t)
            assert got[doc_id]["n_chars"] == len(exp)
    # NFC leaves compatibility chars alone; NFKC folds them
    got_nfc = {r["doc_id"]: r for r in textstats.normalize_text(df, form="NFC").collect()}
    got_nfkc = {r["doc_id"]: r for r in textstats.normalize_text(df, form="NFKC").collect()}
    assert got_nfc[6]["norm_text"] != got_nfkc[6]["norm_text"]
    assert got_nfkc[6]["norm_text"] == "HI fine"
    # idempotence: a second pass is a no-op
    once = textstats.normalize_text(df).select(F.col("doc_id"), F.col("norm_text").alias("text"))
    twice = textstats.normalize_text(once)
    assert twice.filter(F.col("changed")).count() == 0
    # lowercase goes through F.lower (SQL semantics)
    low = {r["doc_id"]: r for r in textstats.normalize_text(df, lowercase=True).collect()}
    assert low[6]["norm_text"] == _brute_normalize(rows[5][1], lowercase=True)
    import pytest as _pt

    with _pt.raises(ValueError):
        textstats.normalize_text(df, form="NFX")


def _brute_gopher(t, min_words=50):
    import re

    words = t.split()
    n = len(words)
    mean_wl = round(sum(len(w) for w in words) / n, 6) if n else 0.0
    n_hash = t.count("#")
    n_ell = (len(t) - len(t.replace("...", ""))) / 3
    sym = round((n_hash + n_ell) / n, 6) if n else 0.0
    lines = [x for x in t.split("\n") if x.strip()]
    nl = len(lines)
    bullet = round(sum(1 for x in lines if re.match(r"^(•|-|\*)", x.strip())) / nl, 6) if nl else 0.0
    ell = round(sum(1 for x in lines if x.strip().endswith("...")) / nl, 6) if nl else 0.0
    alpha = round(sum(1 for w in words if re.search("[a-zA-Z]", w)) / n, 6) if n else 0.0
    stops = len({w.lower() for w in words} & set(textstats.GOPHER_STOPWORDS))
    flags = dict(
        n_words=n, mean_word_len=mean_wl, symbol_ratio=sym, bullet_ratio=bullet,
        ellipsis_ratio=ell, alpha_word_ratio=alpha, stop_hits=stops,
        pass_word_count=min_words <= n <= 100_000,
        pass_mean_word_len=3.0 <= mean_wl <= 10.0,
        pass_symbol_ratio=sym <= 0.1,
        pass_bullet=bullet <= 0.9,
        pass_ellipsis=ell <= 0.3,
        pass_alpha_words=alpha >= 0.8,
        pass_stopwords=stops >= 2,
    )
    flags["gopher_pass"] = all(
        flags[k] for k in flags if k.startswith("pass_")
    )
    return flags


def test_gopher_flags_brute(spark):
    rows = [
        (1, "the quick brown fox jumps with zeal over the lazy dog of note"),
        (2, "- bullet one\n- bullet two\n- bullet three\nplain line..."),
        (3, "### #tag ... more ... stuff #x"),
        (4, "12 34 56 78 90"),              # no alpha words
        (5, ""),                            # empty: everything 0, fails gates
        (6, "supercalifragilisticexpialidocious antidisestablishmentarianism"),  # huge words
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in textstats.gopher_flags(df, min_words=3).collect()}
    for doc_id, t in rows:
        exp = _brute_gopher(t, min_words=3)
        for k, v in exp.items():
            if isinstance(v, float):
                assert got[doc_id][k] == pytest.approx(v, abs=1e-9), (doc_id, k)
            else:
                assert got[doc_id][k] == v, (doc_id, k)
    assert not got[4]["pass_alpha_words"]
    assert not got[6]["pass_mean_word_len"]
    assert got[2]["bullet_ratio"] == 0.75 and got[2]["ellipsis_ratio"] == 0.25


def _brute_chunks(t, chunk, stride):
    toks = t.split()
    n = len(toks)
    if n == 0:
        return []
    last = max(n - chunk, 0)
    starts = sorted({*range(0, last + 1, stride), last})
    return [
        (i, s, toks[s : s + chunk]) for i, s in enumerate(starts)
    ]


def test_chunk_documents_brute(spark):
    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),   # tail not stride-aligned
        (2, " ".join(f"u{i}" for i in range(8))),    # exactly chunk-sized
        (3, " ".join(f"v{i}" for i in range(3))),    # shorter than chunk
        (4, "solo"),                                  # single token
        (5, ""),                                      # empty -> no chunks
        (6, " ".join(f"w{i}" for i in range(12))),   # stride-aligned tail
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = textstats.chunk_documents(df, chunk_tokens=8, stride=4).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 5 not in by_doc
    for doc_id, t in rows:
        exp = _brute_chunks(t, 8, 4)
        gl = sorted(by_doc.get(doc_id, []), key=lambda r: r["chunk_id"])
        assert len(gl) == len(exp), doc_id
        for r, (i, s, toks) in zip(gl, exp):
            assert r["chunk_id"] == i and r["start_token"] == s
            assert r["n_tokens"] == len(toks)
            assert r["chunk_text"] == " ".join(toks)
    # coverage: every token position of doc 1 appears in some chunk
    covered = set()
    for _, s, toks in _brute_chunks(rows[0][1], 8, 4):
        covered |= set(range(s, s + len(toks)))
    assert covered == set(range(10))
    with pytest.raises(ValueError):
        textstats.chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        textstats.chunk_documents(df, stride=-1)


def _brute_mmr(cands, vecs, k, lam):
    """cands: {qid: [(id, rel)]}; vecs: {id: [floats]} -> {qid: [(rank, id, mmr)]}"""
    import math

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    def cos(a, b):
        return round(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))), 6)

    out = {}
    for qid, items in cands.items():
        sel = []
        pool = dict(items)
        # first pick: argmax rel, id tie-break
        first = min(pool, key=lambda i: (-round(lam * pool[i], 6), i))
        sel.append((1, first, round(lam * pool[first], 6)))
        del pool[first]
        for rank in range(2, k + 1):
            if not pool:
                break
            scored = {
                i: round(
                    lam * pool[i]
                    - (1 - lam) * max(cos(vecs[i], vecs[s]) for _, s, _ in sel),
                    6,
                )
                for i in pool
            }
            best = min(scored, key=lambda i: (-scored[i], i))
            sel.append((rank, best, scored[best]))
            del pool[best]
        out[qid] = sel
    return out


def test_mmr_rerank_brute(spark):
    import math

    # 2-d vectors: two tight clusters + one outlier; relevance favors
    # cluster A, diversity must pull in cluster B early
    vecs = {
        1: [1.0, 0.0],
        2: [0.99, 0.14],   # near-dup of 1
        3: [0.98, 0.2],    # near-dup of 1
        4: [0.0, 1.0],     # orthogonal cluster
        5: [0.1, 0.99],
        6: [-0.7, 0.7],    # outlier
    }
    rels = [(0, 1, 0.95), (0, 2, 0.94), (0, 3, 0.93), (0, 4, 0.5), (0, 5, 0.45), (0, 6, 0.2),
            (1, 4, 0.9), (1, 5, 0.89), (1, 1, 0.3), (1, 6, 0.25)]
    cand = spark.createDataFrame(rels, "query_vec_id long, vec_id long, cosine double")
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    for lam in (0.7, 0.5, 1.0):
        got = simsearch.mmr_rerank(cand, emb, k=4, lam=lam).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_vec_id"], []).append(
                (r["rank"], r["vec_id"], r["mmr_score"])
            )
        cands = {}
        for q, i, rel in rels:
            cands.setdefault(q, []).append((i, rel))
        exp = _brute_mmr(cands, vecs, 4, lam)
        for q in exp:
            assert sorted(by_q[q]) == exp[q], (lam, q, sorted(by_q[q]), exp[q])
    # diversity sanity: at lam=0.5 the ~0.99-cosine near-dups of doc 1
    # are penalized below the orthogonal cluster (a pure-relevance sort
    # would pick 1,2,3)
    got = {
        (r["query_vec_id"], r["rank"]): r["vec_id"]
        for r in simsearch.mmr_rerank(cand, emb, k=3, lam=0.5).collect()
    }
    assert got[(0, 1)] == 1 and got[(0, 2)] not in (2, 3)
    # lam=1.0 degenerates to pure relevance order
    got1 = {
        (r["query_vec_id"], r["rank"]): r["vec_id"]
        for r in simsearch.mmr_rerank(cand, emb, k=3, lam=1.0).collect()
    }
    assert [got1[(0, i)] for i in (1, 2, 3)] == [1, 2, 3]
    with pytest.raises(ValueError):
        simsearch.mmr_rerank(cand, emb, k=0)
    with pytest.raises(ValueError):
        simsearch.mmr_rerank(cand, emb, lam=1.5)


def test_group_keyterms_brute(spark):
    import math

    rows = [
        (1, "en", "apple apple banana shared shared"),
        (2, "en", "apple cherry shared rare"),
        (3, "de", "apfel apfel birne shared shared"),
        (4, "de", "apfel kirsche shared"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {}
    for r in textstats.group_keyterms(df, group_col="lang", k=3, min_tf=2).collect():
        got.setdefault(r["lang"], []).append((r["rank"], r["term"], r["tf"], r["score"]))
    # brute replica
    from collections import Counter

    gt = Counter()
    for _, lang, text in rows:
        for t in text.split():
            gt[(lang, t)] += 1
    gt = {kv: c for kv, c in gt.items() if c >= 2}
    tot_g = Counter()
    bg = Counter()
    grand = 0
    for (lang, t), c in gt.items():
        tot_g[lang] += c
        bg[t] += c
        grand += c
    exp = {}
    for (lang, t), c in gt.items():
        score = round(math.log((c / tot_g[lang]) / (bg[t] / grand)), 6)
        exp.setdefault(lang, []).append((score, t, c))
    for lang in exp:
        ranked = sorted(exp[lang], key=lambda x: (-x[0], x[1]))[:3]
        expected = [(i + 1, t, c, s) for i, (s, t, c) in enumerate(ranked)]
        assert sorted(got[lang]) == expected, lang
    # group-exclusive terms outrank the everywhere-term 'shared'
    assert got["en"][0][1] != "shared" and got["de"][0][1] != "shared"
    # min_tf pruned the hapaxes (cherry, rare, birne, kirsche)
    all_terms = {t for v in got.values() for _, t, _, _ in v}
    assert "rare" not in all_terms and "kirsche" not in all_terms


def test_pii_stats_and_redact_brute(spark):
    import re

    rows = [
        (1, "mail me at a.b+c@foo-bar.co.uk or x@y.io thanks"),
        (2, "server 192.168.1.254 and 8.8.8.8 up"),
        (3, "call +1-555-123-4567 now"),
        (4, "no pii here at all"),
        (5, "mixed: u@v.com 10.0.0.7 +49-89-1234567 end"),
        (6, ""),
        (7, "not-an-ip 999.999 and bare @ sign and + plus"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {r["doc_id"]: r.asDict() for r in textstats.pii_stats(df).collect()}
    red = {r["doc_id"]: r.asDict() for r in textstats.redact_pii(df).collect()}
    for doc_id, t in rows:
        exp_total = 0
        out = t
        for kind, pat in textstats.PII_PATTERNS.items():
            n = len(re.findall(pat, t))
            assert stats[doc_id][f"n_{kind}"] == n, (doc_id, kind)
            exp_total += n
            out = re.sub(pat, f"<{kind.upper()}>", out)
        assert stats[doc_id]["n_pii"] == exp_total
        assert red[doc_id]["redacted_text"] == out, doc_id
        assert red[doc_id]["n_redacted"] == exp_total
    assert stats[1]["n_email"] == 2 and stats[2]["n_ipv4"] == 2
    assert stats[3]["n_phone"] == 1 and stats[4]["n_pii"] == 0
    assert "<EMAIL>" in red[5]["redacted_text"] and "<IPV4>" in red[5]["redacted_text"]


def _brute_hash_embed(text, dim):
    import hashlib
    import math

    vec = [0] * dim
    for term in text.split():
        h = hashlib.md5(term.encode()).hexdigest()
        hv = int(h[:8], 16)
        sign = 1 if int(h[8], 16) % 2 == 0 else -1
        vec[hv % dim] += sign
    nrm = math.sqrt(sum(v * v for v in vec))
    if nrm == 0:
        return [0.0] * dim
    return [round(v / nrm, 6) for v in vec]


def test_hash_embed_brute(spark):
    rows = [
        (1, "hello world hello"),
        (2, "hello world"),
        (3, "alpha beta gamma delta"),
        (4, ""),                      # zero vector
        (5, "zebra zebra zebra zebra"),  # single bucket (5), no collision with doc 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: list(r["embedding"]) for r in simsearch.hash_embed(df, dim=8).collect()}
    for doc_id, t in rows:
        assert got[doc_id] == _brute_hash_embed(t, 8), doc_id
    # similar token multisets -> high cosine; disjoint -> ~0
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    assert cos(got[1], got[2]) > 0.85
    assert abs(cos(got[2], got[5])) < 1e-9  # disjoint buckets -> orthogonal
    # unnormalized = raw signed counts
    raw = {r["doc_id"]: list(r["embedding"]) for r in simsearch.hash_embed(df, dim=8, normalize=False).collect()}
    assert all(float(x) == int(x) for x in raw[1])
    assert sum(abs(x) for x in raw[5]) == 4.0
    with pytest.raises(ValueError):
        simsearch.hash_embed(df, dim=0)


def test_chunked_dense_retrieval_composition(spark):
    """chunk -> hash_embed -> knn -> collapse finds the doc containing
    the query's exact token window even when the doc's OTHER chunks are
    noise (the reason to chunk at all)."""
    needle = "spark shuffle partition tuning guide"
    noise = " ".join(f"filler{i}" for i in range(40))
    rows = [
        (1, noise + " " + needle + " " + noise),   # needle buried mid-doc
        (2, noise),                                 # pure noise
        (3, needle),                                # needle-only doc
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = textstats.chunk_documents(docs, chunk_tokens=8, stride=4).select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("cid"), "chunk_text"
    )
    cemb = simsearch.hash_embed(chunks, dim=32, id_col="cid", text_col="chunk_text")
    q = spark.createDataFrame([(0, needle)], "query_vec_id long, query string")
    qemb = simsearch.hash_embed(q, dim=32, id_col="query_vec_id", text_col="query")
    hits = simsearch.knn_cosine(cemb, qemb, k=10, id_col="cid")
    best = (
        hits.withColumn("doc_id", (F.col("cid") / 1000).cast("long"))
        .groupBy("doc_id").agg(F.max("cosine").alias("c"))
        .orderBy(F.desc("c")).collect()
    )
    top_docs = [r["doc_id"] for r in best[:2]]
    assert set(top_docs) == {1, 3}          # both needle docs beat pure noise
    assert best[0]["c"] > 0.8               # a chunk aligned on the needle
    assert best[-1]["doc_id"] == 2 or len(best) == 2


def test_profile_table_brute(spark):
    from tiny_search_engine_spark.pipeline import profile as pr

    rows = [
        (1, "a", None),
        (2, "a", 1.5),
        (3, "b", 1.5),
        (4, "a", 2.0),
        (5, None, 1.5),
    ]
    df = spark.createDataFrame(rows, "id long, cat string, x double")
    got = {}
    for r in pr.profile_table(df, columns=["cat", "x"], k=2).collect():
        got.setdefault(r["col_name"], {})[r["rank"]] = r.asDict()
    cat = got["cat"]
    assert cat[1]["value"] == "a" and cat[1]["n"] == 3
    assert cat[2]["value"] == "b" and cat[2]["n"] == 1  # ties n=1: 'b' < '(null)'? value asc nulls last -> 'b' before null
    assert cat[1]["n_rows"] == 5 and cat[1]["n_nulls"] == 1 and cat[1]["n_distinct"] == 2
    x = got["x"]
    assert x[1]["value"] == "1.5" and x[1]["n"] == 3
    assert x[1]["n_nulls"] == 1 and x[1]["n_distinct"] == 2
    # approx flavor: HLL distinct within small-cardinality exactness
    ap = {r["col_name"]: r for r in pr.profile_table(df, columns=["cat"], k=1, approx=True).collect()}
    assert abs(ap["cat"]["n_distinct"] - 2) <= 1
    # unknown column refuses; k validated
    with pytest.raises(ValueError):
        pr.profile_table(df, columns=["nope"])
    with pytest.raises(ValueError):
        pr.profile_table(df, k=0)


def test_knn_cosine_zero_vector_never_ranks_first(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 0.0]),   # zero vector: cosine must be 0.0, not NaN
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_vec_id"), "embedding"
    )
    got = {r["rank"]: (r["vec_id"], r["cosine"]) for r in simsearch.knn_cosine(emb, q, k=3).collect()}
    assert got[1][0] == 0 and got[1][1] == 1.0
    assert got[3] == (2, 0.0)          # zero vector last with score 0.0
    import math
    assert not any(math.isnan(c) for _, c in got.values())


def test_redact_pii_overlap_counts_match_tags(spark):
    df = spark.createDataFrame(
        [(1, "reach me: a@10.0.0.7.com now")], "doc_id long, text string"
    )
    r = textstats.redact_pii(df).collect()[0]
    # the email pattern consumes the IP-looking domain; only ONE tag is
    # inserted and n_redacted must agree
    assert r["redacted_text"].count("<EMAIL>") == 1
    assert "<IPV4>" not in r["redacted_text"]
    assert r["n_redacted"] == 1


def test_profile_table_min_count(spark):
    from tiny_search_engine_spark.pipeline import profile as pr

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id long, cat string"
    )
    got = {r["rank"]: r for r in pr.profile_table(df, columns=["cat"], k=5, min_count=2).collect()}
    assert len(got) == 1 and got[1]["value"] == "a" and got[1]["n"] == 2
    # summary unskewed by the prune
    assert got[1]["n_rows"] == 3 and got[1]["n_distinct"] == 2
    with pytest.raises(ValueError):
        pr.profile_table(df, min_count=0)


def test_snapshot_diff_brute(spark):
    from tiny_search_engine_spark.pipeline import profile as pr

    old = spark.createDataFrame(
        [(1, "same", "en"), (2, "will change", "en"), (3, "gone", "de"), (5, "null later", "fr")],
        "doc_id long, text string, lang string",
    )
    new = spark.createDataFrame(
        [(1, "same", "en"), (2, "changed!", "en"), (4, "brand new", "es"), (5, None, "fr")],
        "doc_id long, text string, lang string",
    )
    got = {r["doc_id"]: r["status"] for r in pr.snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added", 5: "changed"}
    # NULL sentinel: a NULL field differs from the string it would print as
    r5 = [r for r in pr.snapshot_diff(old, new).collect() if r["doc_id"] == 5][0]
    assert r5["old_fp"] != r5["new_fp"]
    # presence marker: NULL != the literal "\x00" string (old sentinel
    # collision) and NULL != "0" (the marker itself)
    o6 = spark.createDataFrame([(6, "\x00", "en"), (7, "0", "en")], "doc_id long, text string, lang string")
    n6 = spark.createDataFrame([(6, None, "en"), (7, None, "en")], "doc_id long, text string, lang string")
    got6 = {r["doc_id"]: r["status"] for r in pr.snapshot_diff(o6, n6).collect()}
    assert got6 == {6: "changed", 7: "changed"}
    # cmp_cols restriction: ignoring text makes 2 unchanged
    got2 = {r["doc_id"]: r["status"] for r in pr.snapshot_diff(old, new, cmp_cols=["lang"]).collect()}
    assert got2[2] == "unchanged" and got2[5] == "unchanged"
    with pytest.raises(ValueError):
        pr.snapshot_diff(old.select("doc_id"), new.select("doc_id"))


def test_containment_pairs_quote_detection(spark):
    # doc 1 is a verbatim quote inside doc 0's longer text
    article = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    quote = "delta epsilon zeta eta"
    rows = [(0, article), (1, quote), (2, "totally different words here now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"]): r
        for r in dedup.containment_pairs(df, shingle=3, threshold=0.9).collect()
    }
    # the quote's 2 shingles are all inside the article: containment 1.0
    assert set(out) == {(0, 1)}
    r = out[(0, 1)]
    assert r["n_common"] == 2 and r["cont_b"] == 1.0 and r["containment"] == 1.0
    assert r["cont_a"] == pytest.approx(round(2 / 8, 6))
    # Jaccard misses the same pair at any reasonable gate: 2/(8+2-2) = 0.25
    jac = {
        (p["id_a"], p["id_b"])
        for p in dedup.ngram_jaccard_pairs(df, shingle=3, threshold=0.5).collect()
    }
    assert (0, 1) not in jac


def test_containment_pairs_brute(spark):
    rows = [
        (0, "a b c d e f"),
        (1, "c d e f g h"),
        (2, "a b c d"),
        (3, "x y z w"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["cont_a"], r["cont_b"])
        for r in dedup.containment_pairs(df, shingle=2, threshold=0.0).collect()
    }

    def sh(t):
        ts = t.split()
        return {" ".join(ts[i : i + 2]) for i in range(len(ts) - 1)}

    sets = {i: sh(t) for i, t in rows}
    want = {}
    for a in sets:
        for b in sets:
            if a < b and sets[a] & sets[b]:
                n = len(sets[a] & sets[b])
                want[(a, b)] = (
                    round(n / len(sets[a]), 6),
                    round(n / len(sets[b]), 6),
                )
    assert got == {k: (pytest.approx(x), pytest.approx(y)) for k, (x, y) in want.items()}
