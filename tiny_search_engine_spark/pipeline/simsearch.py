"""Similarity search over an embedding column (array<float>).

* ``knn_cosine`` — exact brute-force top-k cosine: query set ⋈ corpus
  (broadcast the small query side), dot product via zip_with/aggregate
  (JVM-side), per-query top-k window. The baseline the ANN paths must
  recall-match.
* ``lsh_buckets`` / ``knn_lsh`` — random-hyperplane LSH: deterministic
  seeded planes (pure function of (seed, plane, dim) via md5 → no stored
  model), bucket = sign-bit string; candidate set = same-bucket rows
  (multi-probe: exact Hamming-1 neighbors optional). At scale the bucket
  join replaces the full cross product; recall measured vs knn_cosine.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    # cast to double BEFORE multiplying: float32 products drift vs the
    # (double-casting) SQL oracles and lose precision at high dim
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def _norm(v):
    return F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda s, x: s + x.cast("double") * x.cast("double"))
    )


def _safe_cos(dot, na, nb):
    """6-dp cosine with a zero-norm guard: a zero vector (hash_embed of an
    empty doc, cancelled buckets) scores 0.0 instead of NaN — Spark sorts
    NaN ABOVE every real double, so an unguarded division would put
    zero-vector garbage at rank 1 of every ranking. The guard only fires
    where the raw division would NOT be a number, so SQL-oracle parity on
    real vectors is unchanged."""
    return F.when((na > 0) & (nb > 0), F.round(dot / (na * nb), 6)).otherwise(F.lit(0.0))


def knn_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_vec_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (query side broadcast)."""
    c = corpus.select(
        F.col(id_col), F.col(vec_col).alias("cv"), _norm(F.col(vec_col)).alias("cn")
    )
    q = queries.select(
        F.col(qid_col), F.col(vec_col).alias("qv"), _norm(F.col(vec_col)).alias("qn")
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine", _safe_cos(_dot(F.col("cv"), F.col("qv")), F.col("cn"), F.col("qn"))
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "cosine")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes: component (p, d) is a
    pure function of (seed, p, d) via sha256 → uniform(-1, 1)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.sha256(f"{seed}:{p}:{d}".encode()).digest()
            u = int.from_bytes(h[:8], "little") / float(1 << 64)  # [0,1)
            row.append(2.0 * u - 1.0)
        planes.append(row)
    return planes


def lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Sign-bit LSH bucket per vector: bucket = Σ 2^p · [v·plane_p > 0].
    ``extra_cols`` ride along (e.g. a label column for pair mining) so
    callers never need an id-keyed self-join to get them back."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(hyperplanes(dim, n_planes, seed)):
        arr = F.array(*[F.lit(x) for x in plane])
        proj = _dot(F.col(vec_col), arr)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(0)
    keep = [F.col(c) for c in extra_cols]
    return df.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"), *keep)


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_vec_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket
    (bucket-local join — the 100 TB shape), then exact cosine rerank."""
    c = lsh_buckets(corpus, dim, n_planes, seed, id_col, vec_col).select(
        id_col, F.col(vec_col).alias("cv"), "bucket"
    )
    q = lsh_buckets(queries, dim, n_planes, seed, qid_col, vec_col).select(
        qid_col, F.col(vec_col).alias("qv"), "bucket"
    )
    scored = c.join(F.broadcast(q), "bucket").withColumn(
        "cosine",
        _safe_cos(_dot(F.col("cv"), F.col("qv")), _norm(F.col("cv")), _norm(F.col("qv"))),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "cosine")
    )


def _top_centroids_udf(centroids: list[tuple[int, list[float]]], n_top: int):
    """Vectorized pandas UDF: embedding → the n_top nearest centroid ids
    by (rounded cosine desc, cid asc). One Arrow-batched (n×d)·(d×C)
    matmul per batch — per-row JVM aggregate-HOFs over C centroids were
    measured ~6x slower than brute-force knn at small C. Rounding to 6
    before the argsort keeps ties identical to the double-only SQL
    oracle; centroids arrive cid-ascending, so a STABLE argsort breaks
    cosine ties by lowest cid."""
    from pyspark.sql.functions import pandas_udf

    cids = np.array([cid for cid, _ in centroids], dtype=np.int64)
    assert (np.diff(cids) > 0).all(), "centroids must be cid-ascending"
    C = np.array([cv for _, cv in centroids], dtype=np.float64).T  # d×C
    cn = np.sqrt((C * C).sum(axis=0))
    cn[cn == 0] = 1.0

    @pandas_udf("array<int>")
    def top_cids(v: pd.Series) -> pd.Series:
        M = np.array([np.asarray(x, dtype=np.float64) for x in v], dtype=np.float64)
        if M.size == 0:
            return pd.Series([], dtype=object)
        vn = np.linalg.norm(M, axis=1)
        vn[vn == 0] = 1.0
        cos = np.round(M @ C / (vn[:, None] * cn[None, :]), 6)
        order = np.argsort(-cos, axis=1, kind="stable")[:, :n_top]
        top = cids[order]
        return pd.Series([r.tolist() for r in top])

    return top_cids


def _top_centroids_cols(
    centroids: list[tuple[int, list[float]]], n_top: int, vec_col
):
    """Pure-codegen twin of _top_centroids_udf: the centroids are already
    driver-side literals (lowest-id OR converged k-means), so routing can
    be column algebra — per-centroid cosine (inlined centroid + its
    precomputed norm), then sort_array over (−cos, cid) structs, whose
    lexicographic ascending order IS (cos desc, cid asc), the UDF's
    stable-argsort tie rule. ``0.0 − cos`` (not unary minus) normalizes
    −0.0 to +0.0 so a zero cosine can't order differently from numpy,
    which treats ±0.0 as equal. No Python in the plan; the Arrow-matmul
    UDF remains the default batch path (measured faster at small C —
    see _top_centroids_udf), this twin is the routing='cols' option the
    plan census exercises."""
    cids = [cid for cid, _ in centroids]
    assert all(a < b for a, b in zip(cids, cids[1:])), "centroids must be cid-ascending"
    vnorm = _norm(vec_col)
    safe = F.when(vnorm > 0, vnorm).otherwise(F.lit(1.0))
    entries = []
    for cid, cv in centroids:
        cn = float(np.linalg.norm(np.asarray(cv, dtype=np.float64))) or 1.0
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(x)) for x in cv]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        cos = F.round(dot / (safe * F.lit(cn)), 6)
        entries.append(
            F.struct(
                (F.lit(0.0) - cos).alias("nc"), F.lit(int(cid)).alias("cid")
            )
        )
    arr = F.sort_array(F.array(*entries))
    return F.transform(
        F.slice(arr, 1, n_top), lambda s: s["cid"].cast("int")
    )


def ivf_centroids(
    corpus: DataFrame, n_centroids: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[tuple[int, list[float]]]:
    """Deterministic centroid set: the n lowest-id corpus vectors (a stand-in
    for a k-means codebook — the IVF *structure* is what the engine owns;
    any codebook plugs in). Tiny → driver-side literal list."""
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.asc(id_col))
        .limit(n_centroids)
        .collect()
    )
    return [(int(r[0]), [float(x) for x in r[1]]) for r in rows]


def ivf_centroids_kmeans(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 10,
    sample_size: int = 4096,
    seed: int = 42,
) -> list[tuple[int, list[float]]]:
    """Spherical k-means codebook (Lloyd over a deterministic sample):
    the real IVF codebook the lowest-id stand-in (ivf_centroids) fakes.

    Deterministic end to end: the sample is the ``sample_size`` corpus
    rows with the smallest xxhash64(id) (order-by + limit plans as a
    distributed TakeOrdered — no full collect, no partition-layout
    dependence); init is k-means++ under a fixed-seed RNG; ties and
    empty-cluster reseeds break by index. Scale shape: only the bounded
    sample (sample_size × dim doubles) ever reaches the driver — Lloyd
    runs in numpy there — while the full-corpus assignment stays
    distributed in ivf_assign, so a 100 TB vector table trains exactly
    like a 10 MB one. Centroid ids are 0..k-1 (dense), unlike the
    lowest-id codebook whose ids are vector ids; both fit the same
    (cid, vec) contract."""
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
        .limit(int(sample_size))
        .collect()
    )
    X = np.array([np.asarray(r[1], dtype=np.float64) for r in rows])
    C = kmeans_codebook(X, n_centroids, n_iters=n_iters, seed=seed)
    return [(j, C[j].tolist()) for j in range(n_centroids)]


def kmeans_codebook(
    X: "np.ndarray", n_centroids: int, n_iters: int = 10, seed: int = 42
) -> "np.ndarray":
    """The pure-numpy spherical-k-means core of ivf_centroids_kmeans:
    sample matrix in, converged (n_centroids × dim) codebook out.

    Factored out so the DuckDB value oracle for knn_ivf_kmeans can
    replay the SAME code over the same deterministic sample (rebuilt
    outside Spark via the bit-exact python xxhash64 twin) and inline the
    converged centroids as SQL literals — the iterative training itself
    is the one non-SQL-expressible step; given the centroids, IVF
    assignment + probe + rerank are plain relational algebra."""
    if len(X) < n_centroids:
        raise ValueError(f"sample ({len(X)}) smaller than n_centroids ({n_centroids})")
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    Xn = X / norms[:, None]

    rng = np.random.default_rng(seed)
    # k-means++ init over the normalized sample (cosine distance = 1 - dot)
    idx = [int(rng.integers(len(Xn)))]
    for _ in range(1, n_centroids):
        sims = Xn @ Xn[idx].T  # n × chosen
        d = np.maximum(0.0, 1.0 - sims.max(axis=1))
        tot = d.sum()
        if tot <= 0:  # fewer distinct directions than centroids
            remaining = [i for i in range(len(Xn)) if i not in idx]
            idx.append(remaining[0])
            continue
        idx.append(int(rng.choice(len(Xn), p=d / tot)))
    C = Xn[idx].copy()

    for _ in range(n_iters):
        cos = Xn @ C.T
        assign = np.argmax(np.round(cos, 12), axis=1)
        newC = np.zeros_like(C)
        for j in range(n_centroids):
            members = Xn[assign == j]
            if len(members) == 0:
                # reseed to the point farthest from its centroid (determ.)
                far = int(np.argmin(cos[np.arange(len(Xn)), assign]))
                newC[j] = Xn[far]
                continue
            m = members.sum(axis=0)
            n = np.linalg.norm(m)
            newC[j] = m / n if n > 0 else C[j]
        if np.allclose(newC, C, atol=1e-12):
            C = newC
            break
        C = newC
    return C


def _router(centroids: list[tuple[int, list[float]]], n_top: int, routing: str):
    """vec_col → array<int> of the n_top nearest centroid ids, same
    semantics both ways: 'arrow' = the Arrow-batched matmul pandas UDF
    (default; measured faster at small C), 'cols' = the pure-codegen
    literal twin (no Python eval in the plan; fuzz-pinned identical in
    tests). Parity holds because both round cosines to 6 dp and break
    ties by lowest cid."""
    if routing == "cols":
        return lambda vec_col: _top_centroids_cols(centroids, n_top, vec_col)
    if routing != "arrow":
        raise ValueError(f"unknown routing {routing!r}; one of ('arrow', 'cols')")
    udf = _top_centroids_udf(centroids, n_top)
    return lambda vec_col: udf(vec_col)


def ivf_assign(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    routing: str = "arrow",
) -> DataFrame:
    """IVF inverted-list assignment: each vector → nearest centroid
    (cosine, ties → lowest centroid id) via the Arrow-batched matmul UDF
    (or the codegen literal twin, ``routing='cols'``);
    at scale centroid_id is the partition key of the vector table (the
    posting-list analog of the fulltext index)."""
    top1 = _router(centroids, 1, routing)
    return corpus.select(
        F.col(id_col),
        F.col(vec_col),
        top1(F.col(vec_col))[0].alias("centroid_id"),
    )


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_vec_id",
    codebook: str = "lowest_id",
    routing: str = "arrow",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via IVF: corpus sharded by nearest centroid,
    each query probes its n_probe nearest centroid lists only (candidate
    volume ~ n_probe/n_centroids of brute force), exact cosine rerank
    inside the probed lists. Deterministic given the corpus either way:
    ``codebook='lowest_id'`` (the SQL-oracle-reproducible stand-in) or
    ``codebook='kmeans'`` (the real spherical-k-means codebook,
    ivf_centroids_kmeans — better-balanced lists → higher recall at the
    same n_probe, pinned in test_pipeline.py). ``routing`` picks the
    centroid-assignment engine: 'arrow' (batch matmul UDF) or 'cols'
    (pure codegen over the inlined literals, identical output)."""
    if codebook == "kmeans":
        centroids = ivf_centroids_kmeans(
            corpus, n_centroids, id_col, vec_col, seed=seed
        )
    else:
        centroids = ivf_centroids(corpus, n_centroids, id_col, vec_col)
    c = ivf_assign(corpus, centroids, id_col, vec_col, routing).select(
        id_col, F.col(vec_col).alias("cv"), "centroid_id"
    )
    topn = _router(centroids, n_probe, routing)
    q = queries.select(
        F.col(qid_col),
        F.col(vec_col).alias("qv"),
        F.explode(topn(F.col(vec_col))).alias("centroid_id"),
    )
    scored = c.join(F.broadcast(q), "centroid_id").withColumn(
        "cosine",
        F.round(
            _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv"))), 6
        ),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "cosine")
    )


def ann_recall(exact: DataFrame, approx: DataFrame, qid_col: str = "query_vec_id", id_col: str = "vec_id") -> float:
    """Recall@k of the ANN result vs the exact result (driver-side scalar)."""
    e = exact.select(qid_col, id_col)
    a = approx.select(qid_col, id_col)
    hit = e.join(a, [qid_col, id_col], "inner").count()
    total = e.count()
    return hit / total if total else 1.0


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN — Jégou et al. 2011 "Product Quantization
# for Nearest Neighbor Search". The vector is split into m subspaces; each
# subspace is vector-quantized against its own n_codes-entry codebook, so a
# d-dim float vector compresses to m small ints, and query-time scoring is
# m table lookups (ADC — asymmetric distance computation) instead of d
# multiplies. The engine keeps EVERYTHING inside whole-stage codegen: encode
# (argmin-L2 over the inlined codebook), the per-query lookup tables, and
# the ADC sum are all column algebra — no Python in the scan, no UDF — so
# the oracle can check the whole path value-exact and a 100 TB corpus
# encodes in one map pass. (The Arrow-matmul encode variant is the
# _top_centroids_udf pattern above if n_codes grows into the thousands.)


def _unit(vec_col):
    """L2-normalized double array (zero vectors pass through unchanged)."""
    n = _norm(vec_col)
    safe = F.when(n > 0, n).otherwise(F.lit(1.0))
    return F.transform(vec_col, lambda x: x.cast("double") / safe)


def pq_codebooks(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    n_codes: int = 8,
    method: str = "lowest_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 10,
    sample_size: int = 4096,
    seed: int = 42,
) -> list[list[list[float]]]:
    """m × n_codes × (dim/m) PQ codebook.

    ``method='lowest_id'`` — subspace j's codebook = subvectors of the
    n_codes lowest-id corpus vectors (L2-normalized), the deterministic,
    SQL-oracle-reproducible stand-in (same contract as ivf_centroids).
    ``method='kmeans'`` — per-subspace Lloyd (L2) over the SAME
    deterministic xxhash64-ordered sample ivf_centroids_kmeans uses:
    only sample_size × dim doubles reach the driver regardless of corpus
    size; ties and empty-cluster reseeds break by index."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    if method == "lowest_id":
        rows = (
            corpus.select(F.col(id_col), _unit(F.col(vec_col)).alias("v"))
            .orderBy(F.asc(id_col))
            .limit(n_codes)
            .collect()
        )
        if len(rows) < n_codes:
            raise ValueError(f"corpus ({len(rows)}) smaller than n_codes ({n_codes})")
        vs = [r["v"] for r in rows]
        return [
            [[float(x) for x in v[j * dsub : (j + 1) * dsub]] for v in vs]
            for j in range(m)
        ]
    if method != "kmeans":
        raise ValueError(f"unknown codebook method {method!r}")
    rows = (
        corpus.select(F.col(id_col), _unit(F.col(vec_col)).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
        .limit(int(sample_size))
        .collect()
    )
    X = np.array([np.asarray(r["v"], dtype=np.float64) for r in rows])
    if len(X) < n_codes:
        raise ValueError(f"sample ({len(X)}) smaller than n_codes ({n_codes})")
    out = []
    for j in range(m):
        C = _subspace_kmeans(
            X[:, j * dsub : (j + 1) * dsub], n_codes, n_iters, seed + j
        )
        out.append([row.tolist() for row in C])
    return out


def _subspace_kmeans(
    S: "np.ndarray", n_codes: int, n_iters: int, seed: int
) -> "np.ndarray":
    """Deterministic L2 Lloyd over one subspace's sample rows (shared by
    the unit-vector and residual codebook trainers). Sampling with
    replacement when the sample is thinner than n_codes keeps per-list
    residual training alive on sparse lists (duplicate seeds separate on
    the first farthest-point reseed)."""
    rng = np.random.default_rng(seed)
    C = S[rng.choice(len(S), size=n_codes, replace=len(S) < n_codes)].copy()
    for _ in range(n_iters):
        d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(np.round(d2, 12), axis=1)
        newC = np.zeros_like(C)
        # reseed each empty cluster with a DISTINCT farthest point —
        # sharing one argmax would duplicate centroids, permanently
        # deadening the extra codes (ties always break low)
        far_order = iter(np.argsort(-d2[np.arange(len(S)), assign], kind="stable"))
        for c in range(n_codes):
            members = S[assign == c]
            if len(members) == 0:
                # default guards the (guarded-against, but cheap to
                # survive) exhausted-iterator case by duplicating the
                # farthest point instead of raising StopIteration
                newC[c] = S[int(next(far_order, c % len(S)))]
            else:
                newC[c] = members.mean(axis=0)
        if np.allclose(newC, C, atol=1e-12):
            C = newC
            break
        C = newC
    return C


def residual_codebooks(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    dim: int,
    m: int = 4,
    n_codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 10,
    sample_size: int = 4096,
    seed: int = 42,
) -> dict[int, list[list[list[float]]]]:
    """Per-IVF-list residual PQ codebooks (Jégou et al. 2011 §V / IVFADC
    with local codebooks): for each list, train per-subspace L2 k-means
    over the residuals ``unit(x) − centroid`` of the sample vectors
    routed to that list — so the codes quantize what ADC actually
    measures instead of the raw unit vector (the documented
    simplification this retires, behind ``knn_ivfpq(encode="residual")``).

    Deterministic and driver-bounded exactly like ivf_centroids_kmeans:
    the same xxhash64-ordered sample, assignment replayed with
    _top_centroids_udf's own semantics (cosine rounded to 6, stable
    ties to the lowest cid), k-means ties by index. A list with no
    sample members falls back to the global residual pool so every list
    has a live codebook. The numpy core (residual_codebooks_np) takes
    RAW sample rows and normalizes internally, so the driver's DuckDB
    value oracle can replay training bit-identically from the same
    parquet bytes (the kmeans_codebook discipline); recall superiority
    over unit-vector codes at equal m/n_codes is pinned in tests."""
    rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
        .limit(int(sample_size))
        .collect()
    )
    X_raw = np.array([np.asarray(r[1], dtype=np.float64) for r in rows])
    return residual_codebooks_np(
        X_raw, centroids, dim, m=m, n_codes=n_codes, n_iters=n_iters, seed=seed
    )


def residual_codebooks_np(
    X_raw: "np.ndarray",
    centroids: list[tuple[int, list[float]]],
    dim: int,
    m: int = 4,
    n_codes: int = 8,
    n_iters: int = 10,
    seed: int = 42,
) -> dict[int, list[list[list[float]]]]:
    """Pure-numpy core of residual_codebooks: RAW float64 sample rows in
    (xxhash64-sample order), per-list per-subspace codebooks out.
    Factored out — like kmeans_codebook — so the knn_ivfpq_residual
    DuckDB oracle replays the SAME training over the same deterministic
    sample outside Spark and inlines the converged codebooks as SQL
    literals; encode/LUT/ADC downstream are plain relational algebra."""
    dsub = dim // m
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    cids = np.array([cid for cid, _ in centroids], dtype=np.int64)
    C = np.array([cv for _, cv in centroids], dtype=np.float64)
    cn = np.linalg.norm(C, axis=1)
    cn[cn == 0] = 1.0
    xn = np.linalg.norm(X_raw, axis=1)
    xn[xn == 0] = 1.0
    X = X_raw / xn[:, None]
    # assignment replays the router on the RAW vector (scale-invariant
    # cosine, rounded 6, stable ties to lowest cid) like the engine
    cos = np.round(X_raw @ C.T / (xn[:, None] * cn[None, :]), 6)
    assign = cids[np.argsort(-cos, axis=1, kind="stable")[:, 0]]
    out: dict[int, list[list[list[float]]]] = {}
    for li, cid in enumerate(cids):
        members = X[assign == cid]
        pool = members if len(members) > 0 else X
        R = pool - C[li]
        cbs = []
        for j in range(m):
            Cj = _subspace_kmeans(
                R[:, j * dsub : (j + 1) * dsub], n_codes, n_iters,
                seed + 101 * li + j,
            )
            cbs.append([row.tolist() for row in Cj])
        out[int(cid)] = cbs
    return out


def _cb_lit(cb_j: list[list[float]]):
    """One subspace codebook as an inlined array<array<double>> literal."""
    return F.array(*[F.array(*[F.lit(float(x)) for x in code]) for code in cb_j])


def _sub(vcol, j: int, dsub: int):
    return F.slice(vcol, j * dsub + 1, dsub)


def _l2sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda s, x: s + x
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ codes per vector: code_j = argmin over the subspace codebook of
    the squared L2 distance from the (unit-normalized) subvector, distances
    rounded to 6 dp before the argmin with ties to the LOWEST code — the
    exact rule the SQL oracle can reproduce. Emits (id, vec, codes:array<int>);
    m·n_codes·dsub = dim·n_codes fused multiply-adds per row, all codegen."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    unit = corpus.select(
        F.col(id_col), F.col(vec_col), _unit(F.col(vec_col)).alias("_u")
    )
    def _dist_fn(j: int):
        # NB: must return a UNARY lambda — F.transform treats a second
        # parameter as the element-index argument (see minhash_signatures)
        return lambda code: F.round(_l2sq(_sub(F.col("_u"), j, dsub), code), 6)

    codes = []
    for j in range(m):
        dists = F.transform(_cb_lit(codebooks[j]), _dist_fn(j))
        codes.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias(f"_c{j}")
        )
    return unit.select(
        F.col(id_col), F.col(vec_col), F.array(*codes).alias("codes")
    )


def knn_pq(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    m: int = 4,
    n_codes: int = 8,
    refine: int = 3,
    codebook: str = "lowest_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via PQ + ADC with exact rerank: corpus encoded to
    m codes; each (broadcast) query carries an m × n_codes lookup table of
    subspace L2² distances; candidate score = Σ_j lut_j[code_j] (m lookups
    per corpus row — the PQ win: scan cost independent of dim); the
    refine·k best candidates per query by (rounded ADC asc, id asc) get an
    exact cosine rerank, so output precision is exact and only recall is
    approximate (measured vs knn_cosine in tests).

    Scale shape: the encoded corpus is a one-off map pass (and at rest is
    m bytes + id per vector — the 100 TB vector table compresses ~64×);
    serving scans codes only (the full vectors never enter the ADC scan
    or its shuffle): the shortlist window exchanges bare (query, id, adc)
    triples, pre-pruned map-side to refine·k per query by Catalyst's
    rank-limit pushdown (WindowGroupLimit Partial, SPARK-37099), and the
    exact rerank joins the k·refine·n_queries SURVIVORS (broadcast) back
    to the corpus vectors. All column algebra, SQL-expressible: oracle
    ``knn_pq`` checks the full path value-exact."""
    cbs = pq_codebooks(
        corpus, dim, m=m, n_codes=n_codes, method=codebook,
        id_col=id_col, vec_col=vec_col, seed=seed,
    )
    dsub = dim // m
    enc = pq_encode(corpus, cbs, id_col, vec_col).select(id_col, "codes")
    qu = queries.select(F.col(qid_col), _unit(F.col(vec_col)).alias("_qu"))
    def _lut_fn(j: int):
        # unary on purpose — a second lambda param would bind the index
        return lambda code: _l2sq(_sub(F.col("_qu"), j, dsub), code)

    luts = F.array(*[F.transform(_cb_lit(cbs[j]), _lut_fn(j)) for j in range(m)])
    qlut = qu.select(qid_col, luts.alias("_luts"))
    adc = F.round(
        F.aggregate(
            F.zip_with(
                F.col("codes"), F.col("_luts"), lambda c, l: F.element_at(l, c + 1)
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        ),
        6,
    )
    cand = enc.crossJoin(F.broadcast(qlut)).select(
        F.col(qid_col), F.col(id_col), adc.alias("_adc")
    )
    wq = Window.partitionBy(qid_col).orderBy(F.asc("_adc"), F.asc(id_col))
    short = (
        cand.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= refine * k)
        .select(qid_col, id_col)
    )
    rer = (
        corpus.select(F.col(id_col), F.col(vec_col).alias("cv"))
        .join(F.broadcast(short), id_col)
        .join(
            F.broadcast(queries.select(F.col(qid_col), F.col(vec_col).alias("qv"))),
            qid_col,
        )
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv"))), 6
            ),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "cosine")
    )


def knn_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    m: int = 4,
    n_codes: int = 8,
    n_centroids: int = 16,
    n_probe: int = 4,
    refine: int = 3,
    codebook: str = "lowest_id",
    encode: str = "unit",
    routing: str = "arrow",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_vec_id",
    seed: int = 42,
) -> DataFrame:
    """IVF-routed PQ ANN (the IVFADC serving architecture, Jégou et al.
    2011 §V): the composition knn_pq's flat scan cannot scale to — each
    vector is assigned to its nearest IVF centroid AND PQ-encoded in one
    map pass; each query probes only its ``n_probe`` nearest lists, so
    the ADC scan becomes an EQUI-join on centroid_id touching
    ~n_probe/n_centroids of the code table instead of a per-query
    full-corpus crossJoin. Shortlist (refine·k per query by rounded ADC
    asc, id asc, rank-limit pushed down map-side) then exact cosine
    rerank, as in knn_pq — output precision exact, recall approximate
    and bounded below by the probed-list candidate set.

    ``encode`` picks the quantization target. ``"unit"`` codes quantize
    the unit vector itself — a simplification vs the paper that keeps
    the whole path value-exact under the SQL oracle. ``"residual"`` is
    the paper's actual IVFADC: per-LIST codebooks trained on the
    residuals ``unit(x) − centroid`` (residual_codebooks; iterative →
    rows-only, like knn_ivf_kmeans), codes/LUTs measure the residual so
    quantization error shrinks with list locality — recall at equal
    m/n_codes is pinned ≥ the unit path in tests. The per-list
    codebooks ride a BROADCAST join on centroid_id (model-sized: one
    row per list), after which encode/ADC stay pure codegen.

    Scale shape: at rest each vector is (id, centroid_id, m codes) —
    centroid_id is the partition key of the code table (the posting-list
    analog); a 1000-query batch against 100 TB scans n_probe lists per
    query rather than 1000 full passes, and the broadcast side is just
    n_queries × n_probe LUT rows. ``codebook`` picks lowest_id
    (SQL-reproducible; the driver oracle ``knn_ivfpq``) or kmeans (real
    codebooks for both IVF and PQ; rows-only, recall pinned in tests)."""
    if encode not in ("unit", "residual"):
        raise ValueError(f"unknown encode {encode!r}; one of ('unit', 'residual')")
    if codebook == "kmeans":
        centroids = ivf_centroids_kmeans(
            corpus, n_centroids, id_col, vec_col, seed=seed
        )
    else:
        centroids = ivf_centroids(corpus, n_centroids, id_col, vec_col)
    dsub = dim // m
    top1 = _router(centroids, 1, routing)
    topn = _router(centroids, n_probe, routing)
    if encode == "residual":
        # per-list residual codebooks ride ONE broadcast join on the list
        # id (model-sized: a row per centroid); encode and LUTs are then
        # pure codegen over the joined arrays
        rcbs = residual_codebooks(
            corpus, centroids, dim, m=m, n_codes=n_codes,
            id_col=id_col, vec_col=vec_col, seed=seed,
        )
        cb_df = corpus.sparkSession.createDataFrame(
            [
                (int(cid), [float(x) for x in cv], rcbs[int(cid)])
                for cid, cv in centroids
            ],
            "centroid_id long, _cv array<double>, _cbs array<array<array<double>>>",
        )

        def _rdist_fn(j: int):
            return lambda code: F.round(_l2sq(_sub(F.col("_res"), j, dsub), code), 6)

        enc = (
            corpus.select(
                F.col(id_col),
                _unit(F.col(vec_col)).alias("_u"),
                top1(F.col(vec_col))[0].cast("long").alias("centroid_id"),
            )
            .join(F.broadcast(cb_df), "centroid_id")
            .withColumn(
                "_res", F.zip_with(F.col("_u"), F.col("_cv"), lambda x, y: x - y)
            )
        )
        rcodes = []
        for j in range(m):
            dists = F.transform(F.col("_cbs")[j], _rdist_fn(j))
            rcodes.append(
                (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
            )
        enc = enc.select(
            F.col(id_col), F.array(*rcodes).alias("codes"), "centroid_id"
        )

        def _rlut_fn(j: int):
            return lambda code: _l2sq(_sub(F.col("_rq"), j, dsub), code)

        qlut = (
            queries.select(
                F.col(qid_col),
                F.col(vec_col).alias("_qv"),
                _unit(F.col(vec_col)).alias("_qu"),
            )
            .select(
                F.col(qid_col),
                F.col("_qu"),
                F.explode(topn(F.col("_qv"))).alias("_cid"),
            )
            .withColumn("centroid_id", F.col("_cid").cast("long"))
            .join(F.broadcast(cb_df), "centroid_id")
            .withColumn(
                "_rq", F.zip_with(F.col("_qu"), F.col("_cv"), lambda x, y: x - y)
            )
            .select(
                F.col(qid_col),
                F.array(
                    *[F.transform(F.col("_cbs")[j], _rlut_fn(j)) for j in range(m)]
                ).alias("_luts"),
                "centroid_id",
            )
        )
    else:
        cbs = pq_codebooks(
            corpus, dim, m=m, n_codes=n_codes, method=codebook,
            id_col=id_col, vec_col=vec_col, seed=seed,
        )
        # one map pass: PQ codes (column algebra) + IVF list id (Arrow matmul)
        enc = pq_encode(corpus, cbs, id_col, vec_col).select(
            F.col(id_col),
            F.col("codes"),
            top1(F.col(vec_col))[0].alias("centroid_id"),
        )
        qu = queries.select(
            F.col(qid_col), F.col(vec_col).alias("_qv"), _unit(F.col(vec_col)).alias("_qu")
        )

        def _lut_fn(j: int):
            # unary on purpose — a second lambda param would bind the index
            return lambda code: _l2sq(_sub(F.col("_qu"), j, dsub), code)

        luts = F.array(*[F.transform(_cb_lit(cbs[j]), _lut_fn(j)) for j in range(m)])
        qlut = qu.select(
            F.col(qid_col),
            luts.alias("_luts"),
            F.explode(topn(F.col("_qv"))).alias("centroid_id"),
        )
    adc = F.round(
        F.aggregate(
            F.zip_with(
                F.col("codes"), F.col("_luts"), lambda c, l: F.element_at(l, c + 1)
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        ),
        6,
    )
    # the routed scan: equi-join on the list id replaces knn_pq's crossJoin
    cand = enc.join(F.broadcast(qlut), "centroid_id").select(
        F.col(qid_col), F.col(id_col), adc.alias("_adc")
    )
    wq = Window.partitionBy(qid_col).orderBy(F.asc("_adc"), F.asc(id_col))
    short = (
        cand.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= refine * k)
        .select(qid_col, id_col)
    )
    rer = (
        corpus.select(F.col(id_col), F.col(vec_col).alias("cv"))
        .join(F.broadcast(short), id_col)
        .join(
            F.broadcast(queries.select(F.col(qid_col), F.col(vec_col).alias("qv"))),
            qid_col,
        )
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv"))), 6
            ),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "cosine")
    )


def semantic_dedup(
    corpus: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.95,
    codebook: str = "lowest_id",
    routing: str = "arrow",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    assignments: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster the embedding
    table, then mark as duplicates the vectors that have a same-cluster
    neighbor above the cosine ``threshold``. Keep rule is deterministic:
    a vector is dropped iff a LOWER-id vector in its cluster is within
    the threshold (so the lowest id of every near-duplicate chain
    survives, and chains collapse without an iterative component pass —
    the paper keeps one exemplar per dup pair; keep-lowest-witness is
    the order-free equivalent).

    Returns one row per input vector:
    (vec_id, centroid_id, is_kept, n_dup_witnesses) where
    ``n_dup_witnesses`` counts the lower-id same-cluster vectors above
    the threshold (0 for kept rows).

    The reference deduplicates nothing (its corpus loader keeps every
    row, src/table.cpp:139-176); this is the embedding-space member of
    the dedup family (exact/MinHash/SimHash/ngram live in
    pipeline/dedup.py) — the one that catches paraphrases sharing no
    tokens, which no lexical detector in that family can.

    Scale shape: THE point of SemDeDup — the pairwise cosine join is
    cluster-bounded (Σ_c |c|² vs |corpus|² for the brute pass;
    ``embedding_neardup_pairs`` is that labeled exact baseline), and
    every stage is an equi-join on centroid_id, never a cross join. At
    100 TB you size n_clusters ∝ corpus so the expected cluster stays
    O(corpus / n_clusters) ≈ constant, assign once (one map pass over
    the vector table, codebook broadcast inside the Arrow UDF), and the
    pair join shuffles each cluster to one task. ``codebook='lowest_id'``
    is SQL-oracle-reproducible; ``codebook='kmeans'`` plugs in the real
    spherical-k-means codebook (balanced clusters → tighter bound).

    The self-join references the assignment THREE times (pair left, pair
    right, final projection); a declarative plan recomputes the Arrow
    assignment pass per reference. At scale, materialize it once and
    pass it back in via ``assignments`` (a (id, vec, centroid_id) frame
    from ``ivf_assign`` — e.g. written to parquet partitioned by
    centroid_id, which also pre-co-locates the pair join); default None
    recomputes inline, which the SQL oracle reproduces exactly."""
    if assignments is not None:
        assign = assignments
    else:
        if codebook == "kmeans":
            centroids = ivf_centroids_kmeans(
                corpus, n_clusters, id_col, vec_col, seed=seed
            )
        else:
            centroids = ivf_centroids(corpus, n_clusters, id_col, vec_col)
        assign = ivf_assign(corpus, centroids, id_col, vec_col, routing)
    left = assign.select(
        F.col(id_col), F.col(vec_col).alias("_v"), "centroid_id"
    )
    right = assign.select(
        F.col(id_col).alias("_rid"), F.col(vec_col).alias("_rv"), "centroid_id"
    )
    witnesses = (
        left.join(right, "centroid_id")
        .filter(F.col("_rid") < F.col(id_col))
        .withColumn(
            "_cos",
            F.round(
                _dot(F.col("_v"), F.col("_rv")) / (_norm(F.col("_v")) * _norm(F.col("_rv"))),
                6,
            ),
        )
        .filter(F.col("_cos") >= threshold)
        .groupBy(id_col)
        .agg(F.count("*").alias("n_dup_witnesses"))
    )
    return (
        assign.select(id_col, "centroid_id")
        .join(witnesses, id_col, "left")
        .select(
            id_col,
            F.col("centroid_id").cast("long").alias("centroid_id"),
            F.col("n_dup_witnesses").isNull().alias("is_kept"),
            F.coalesce(F.col("n_dup_witnesses"), F.lit(0).cast("long")).alias(
                "n_dup_witnesses"
            ),
        )
    )


def mmr_rerank(
    candidates: DataFrame,
    emb: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    query_col: str = "query_vec_id",
    id_col: str = "vec_id",
    rel_col: str = "cosine",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
    of a per-query candidate set: greedily pick the item maximizing
    ``lam·rel − (1−lam)·max_{s∈selected} cos(item, s)`` — the standard
    result-diversification layer over an ANN / hybrid ranking (the
    reference's funnel re-sorts by relevance only, table.cpp:600-667;
    diversity is the missing axis).

    ``candidates`` is a bounded top-N-per-query set (query, id, rel) —
    e.g. ``knn_cosine``/``rrf_fuse`` output; ``emb`` supplies vectors for
    the pairwise-similarity term. The first pick's score is
    ``round(lam·rel, 6)`` (empty selected set ⇒ zero penalty term).

    Determinism/oracle: every arithmetic step mirrors the DuckDB unroll —
    6-dp-rounded cosines (the engine's proven `_dot`+round path), inlined
    ``lam``/``1−lam`` doubles, argmax via (score desc, id asc)
    row_number — so the driver value-hash is exact, like `doc_pagerank`.

    Scale shape: this never touches the corpus — it loops k times over
    the RESULT-SET-sized candidate slice (≤ N·|queries| rows; the emb
    join semi-joins the corpus once via a broadcast of the candidate
    ids). Each step is one equi-join on query_col + one windowed argmax;
    selected-set lineage is localCheckpoint-truncated per step (the
    resolve_clusters discipline), so plans stay flat for any k.
    """
    if k < 1:
        raise ValueError("mmr_rerank: k must be >= 1")
    if not (0.0 <= lam <= 1.0):
        raise ValueError("mmr_rerank: lam must be in [0, 1]")
    lam_lit = F.lit(float(lam))
    pen_lit = F.lit(1.0 - float(lam))

    vecs = emb.select(
        F.col(id_col), F.col(vec_col).alias("_v"), _norm(F.col(vec_col)).alias("_n")
    )
    cand = (
        vecs.join(
            F.broadcast(candidates.select(query_col, id_col, F.col(rel_col).alias("_rel"))),
            id_col,
        )
        .select(query_col, id_col, "_rel", "_v", "_n")
        .localCheckpoint()
    )
    w = Window.partitionBy(query_col).orderBy(F.desc("_mmr"), F.asc(id_col))
    first = (
        cand.withColumn("_mmr", F.round(lam_lit * F.col("_rel"), 6))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(query_col, id_col, "_v", "_n", F.col("_mmr"), F.lit(1).alias("rank"))
        .localCheckpoint()
    )
    selected = first
    for step in range(2, k + 1):
        rem = cand.join(selected.select(query_col, id_col), [query_col, id_col], "left_anti")
        s = selected.select(
            F.col(query_col),
            F.col("_v").alias("_sv"),
            F.col("_n").alias("_sn"),
        )
        sim = _safe_cos(_dot(F.col("_v"), F.col("_sv")), F.col("_n"), F.col("_sn"))
        picked = (
            rem.join(s, query_col)
            .withColumn("_sim", sim)
            .groupBy(query_col, id_col)
            .agg(
                F.max("_sim").alias("_maxsim"),
                # constant within the (query, id) group — first() is exact
                F.first("_rel").alias("_rel"),
                F.first("_v").alias("_v"),
                F.first("_n").alias("_n"),
            )
            .withColumn("_mmr", F.round(lam_lit * F.col("_rel") - pen_lit * F.col("_maxsim"), 6))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(query_col, id_col, "_v", "_n", "_mmr", F.lit(step).alias("rank"))
        )
        selected = selected.unionByName(picked).localCheckpoint()
    return selected.select(
        query_col, "rank", id_col, F.col("_mmr").alias("mmr_score")
    )


def hash_embed(
    df: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """Model-free text embeddings via the feature-hashing trick
    (Weinberger et al. 2009): each token hashes to a bucket (md5 bits
    0-31 mod dim) with a ±1 sign (md5 bit 32-35 parity), vectors are the
    per-bucket signed counts, L2-normalized. Similar token multisets ⇒
    similar vectors, no trained model — the embedder that makes the
    chunk → embed → ANN RAG path (`textstats.chunk_documents` →
    `knn_cosine`/`knn_lsh`) runnable anywhere, and the stand-in seam a
    real encoder later replaces (same (id, array<double>) contract).

    md5 was chosen over xxhash64 because BOTH engines compute it
    natively — the DuckDB oracle replays every bit (hex-substring
    bucket, sign parity, integer bucket sums, 6-dp-rounded normalized
    components). Empty docs yield the zero vector.

    Scale shape: one corpus pass exploding tokens, ONE shuffle keyed by
    (id, bucket) with map-side partial sums, then a per-id map assembly —
    no dim² work, no Python."""
    if dim < 1:
        raise ValueError("hash_embed: dim must be >= 1")
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
        ).alias("term"),
    )
    h = F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("long")
    sbit = F.conv(F.substring(F.md5(F.col("term")), 9, 1), 16, 10).cast("long") % 2
    buckets = (
        toks.withColumn("bucket", (h % dim).cast("int"))
        .withColumn("s", F.when(sbit == 0, F.lit(1)).otherwise(F.lit(-1)))
        .groupBy(id_col, "bucket")
        .agg(F.sum("s").alias("v"))
    )
    per_id = buckets.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "v"))).alias("_m"),
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("_nrm"),
    )
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    if normalize:
        comp = lambda j: F.when(  # noqa: E731
            F.col("_nrm") > 0,
            F.round(F.coalesce(F.col("_m")[j], F.lit(0)) / F.col("_nrm"), 6),
        ).otherwise(F.lit(0.0))
    else:
        comp = lambda j: F.coalesce(F.col("_m")[j], F.lit(0)).cast("double")  # noqa: E731
    # docs with no tokens: keep as zero vectors (left join back)
    out = df.select(id_col).join(per_id, id_col, "left").select(
        id_col,
        F.transform(idx, comp).alias("embedding"),
    )
    return out


def mine_contrastive_pairs(
    corpus: DataFrame,
    anchors: DataFrame,
    dim: int,
    k_pos: int = 3,
    k_neg: int = 3,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    anchor_col: str = "anchor_id",
) -> DataFrame:
    """Contrastive training-pair mining: for each anchor vector, the
    hardest positives (same label, LOWEST cosine — the pairs the model
    most needs pulled together) and hardest negatives (different label,
    HIGHEST cosine — the pairs it most needs pushed apart), mined within
    the anchor's sign-bit LSH bucket. LSH collision IS the hardness
    filter: a different-label vector that lands in the anchor's bucket is
    geometrically close by construction, which is exactly the in-batch /
    ANN-mined hard-negative recipe of dense-retriever training (Xiong et
    al. 2021, ANCE — approximate nearest neighbors as negatives). The
    reference engine has no training surface at all; this feeds one from
    the same embedding table its ANN family serves.

    Output: (anchor_id, role 'positive'|'negative', rank, vec_id, cosine,
    label) — rank 1 = hardest within the role. Self-matches excluded.

    Scale shape: identical to knn_lsh — bucket-equi-join of the corpus
    against the broadcast anchor set (never a cross join; candidate
    volume ~ corpus/2^n_planes per anchor), exact cosine only inside the
    bucket, one window partitioned by (anchor, role). Cosine is rounded
    to 6 dp BEFORE ranking (id-asc tie-break) so the oracle
    (``contrastive_pairs``, planes inlined as SQL literals) orders
    identically."""
    if k_pos < 0 or k_neg < 0 or k_pos + k_neg == 0:
        raise ValueError(f"need k_pos/k_neg >= 0 and not both 0, got {k_pos}/{k_neg}")
    c = lsh_buckets(
        corpus, dim, n_planes, seed, id_col, vec_col, extra_cols=(label_col,)
    ).select(id_col, F.col(vec_col).alias("cv"), "bucket", F.col(label_col).alias("_cl"))
    a = lsh_buckets(
        anchors, dim, n_planes, seed, id_col, vec_col, extra_cols=(label_col,)
    ).select(
        F.col(id_col).alias(anchor_col),
        F.col(vec_col).alias("qv"),
        "bucket",
        F.col(label_col).alias("_al"),
    )
    scored = (
        c.join(F.broadcast(a), "bucket")
        .filter(F.col(id_col) != F.col(anchor_col))
        .withColumn(
            "cosine",
            F.round(
                _safe_cos(_dot(F.col("cv"), F.col("qv")), _norm(F.col("cv")), _norm(F.col("qv"))),
                6,
            ),
        )
        .withColumn(
            "role",
            F.when(F.col("_cl") == F.col("_al"), F.lit("positive")).otherwise(
                F.lit("negative")
            ),
        )
    )
    # hard positives sort cosine ASC, hard negatives DESC — one window via
    # a signed key so both roles rank in the same pass
    ordkey = F.when(F.col("role") == "positive", F.col("cosine")).otherwise(
        -F.col("cosine")
    )
    w = Window.partitionBy(anchor_col, "role").orderBy(ordkey.asc(), F.asc(id_col))
    kcap = F.when(F.col("role") == "positive", F.lit(k_pos)).otherwise(F.lit(k_neg))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kcap)
        .select(anchor_col, "role", "rank", id_col, "cosine", F.col("_cl").alias(label_col))
    )
