"""Ranking-quality evaluation: NDCG@k over a labeled query set.

The reference's entire quality methodology is labeled-corpus NDCG@3
(/root/reference/README.md:50-57 — every release is scored "NDCG@3;
n_queries" on a query→(url,label) test set whose labels live in column 4
of index/url.list.utf8, parsed then ignored by the C++ build at
src/table.cpp:157-171). This module closes that gap for the Spark engine:
rounds can compare ranking QUALITY across scorer profiles (vsm vs cqr·ctr
vs bm25), not just rank-identity against the golden model.

Everything is column algebra — no UDFs, no driver loops — so it runs on a
billion-query eval set exactly like on thirty: one broadcast-able join of
the ranking against the label table, one per-query aggregation, one global
mean. Gain is the classic graded-relevance form (2^label − 1); discount is
1/log2(rank+1); IDCG ranks the query's OWN labels descending (standard
NDCG, label ties broken by doc_id for determinism). Queries with no
positive label get ndcg = 0.0 (they cannot be ranked well, and dropping
them would inflate the mean — the reference reports "metric; n_queries"
for the same reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def labels_from_tsv(versions: DataFrame) -> DataFrame:
    """(query, doc_id, label) from a load_tsv_corpus frame: the label of a
    (query, url) pair is taken from its LAST line (same last-wins rule as
    the forward table), null labels → 0."""
    w = Window.partitionBy("query", "doc_id").orderBy(F.col("line_id").desc())
    return (
        versions.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(
            "query",
            "doc_id",
            F.coalesce(F.col("label"), F.lit(0)).alias("label"),
        )
    )


def _dcg(label_col, rank_col):
    return (F.pow(F.lit(2.0), label_col) - F.lit(1.0)) / F.log2(rank_col + F.lit(1.0))


def ndcg_at_k(
    ranked: DataFrame,
    labels: DataFrame,
    k: int = 3,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    label_col: str = "label",
) -> DataFrame:
    """Per-query NDCG@k: *ranked* is (query, rank, doc) — any ranking the
    engine produced; *labels* is (query, doc, graded relevance).

    Returns one row per query present in *ranked*: (query_col, ndcg).
    Unlabeled retrieved docs count as label 0; IDCG uses the query's full
    label set (the ideal ranking may include docs the engine missed —
    that's what makes recall failures visible in the score).
    """
    r = ranked.select(query_col, doc_col, rank_col).filter(F.col(rank_col) <= k)
    lab = labels.select(
        F.col(query_col), F.col(doc_col), F.col(label_col).cast("double").alias("_lab")
    )
    dcg = (
        r.join(lab, [query_col, doc_col], "left")
        .withColumn("_g", _dcg(F.coalesce("_lab", F.lit(0.0)), F.col(rank_col)))
        .groupBy(query_col)
        .agg(F.sum("_g").alias("_dcg"))
    )
    iw = Window.partitionBy(query_col).orderBy(
        F.col("_lab").desc(), F.col(doc_col).asc()
    )
    idcg = (
        lab.withColumn("_ir", F.row_number().over(iw))
        .filter(F.col("_ir") <= k)
        .withColumn("_g", _dcg(F.col("_lab"), F.col("_ir")))
        .groupBy(query_col)
        .agg(F.sum("_g").alias("_idcg"))
    )
    return (
        dcg.join(idcg, query_col, "left")
        .select(
            query_col,
            F.when(
                F.coalesce("_idcg", F.lit(0.0)) > 0.0, F.col("_dcg") / F.col("_idcg")
            )
            .otherwise(F.lit(0.0))
            .alias("ndcg"),
        )
    )


def mrr_at_k(
    ranked: DataFrame,
    labels: DataFrame,
    k: int = 10,
    min_label: int = 1,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    label_col: str = "label",
) -> DataFrame:
    """Per-query reciprocal rank of the first relevant doc (label ≥
    *min_label*) within the top-k; queries that retrieved no relevant doc
    get 0.0.  Returns (query_col, mrr) — one row per query in *ranked*."""
    r = ranked.select(query_col, doc_col, rank_col).filter(F.col(rank_col) <= k)
    rel = labels.filter(F.col(label_col) >= min_label).select(query_col, doc_col)
    first = (
        r.join(rel, [query_col, doc_col])
        .groupBy(query_col)
        .agg(F.min(rank_col).alias("_fr"))
    )
    return (
        r.select(query_col)
        .distinct()
        .join(first, query_col, "left")
        .select(
            query_col,
            F.when(F.col("_fr").isNotNull(), F.lit(1.0) / F.col("_fr"))
            .otherwise(F.lit(0.0))
            .alias("mrr"),
        )
    )


def recall_at_k(
    ranked: DataFrame,
    labels: DataFrame,
    k: int = 10,
    min_label: int = 1,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    label_col: str = "label",
) -> DataFrame:
    """Per-query |relevant ∩ top-k| / |relevant|; queries with no relevant
    docs at all get 0.0 (same no-positive rule as ndcg_at_k — dropping
    them would inflate the mean)."""
    r = ranked.select(query_col, doc_col, rank_col).filter(F.col(rank_col) <= k)
    rel = labels.filter(F.col(label_col) >= min_label).select(query_col, doc_col)
    n_rel = rel.groupBy(query_col).agg(F.count("*").alias("_n_rel"))
    n_hit = (
        r.join(rel, [query_col, doc_col])
        .groupBy(query_col)
        .agg(F.count("*").alias("_n_hit"))
    )
    return (
        r.select(query_col)
        .distinct()
        .join(n_rel, query_col, "left")
        .join(n_hit, query_col, "left")
        .select(
            query_col,
            F.when(
                F.coalesce("_n_rel", F.lit(0)) > 0,
                F.coalesce("_n_hit", F.lit(0)) / F.col("_n_rel"),
            )
            .otherwise(F.lit(0.0))
            .alias("recall"),
        )
    )


def mean_ndcg_at_k(ranked: DataFrame, labels: DataFrame, k: int = 3, **kw) -> float:
    """The reference's headline number: mean NDCG@k over the query set."""
    row = (
        ndcg_at_k(ranked, labels, k=k, **kw)
        .agg(F.avg("ndcg").alias("m"), F.count("*").alias("n"))
        .collect()[0]
    )
    return float(row["m"]) if row["n"] else 0.0


def rbo_at_k(
    run_a: DataFrame,
    run_b: DataFrame,
    k: int = 10,
    p: float = 0.9,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Truncated Rank-Biased Overlap (Webber et al. 2010) between two
    per-query rankings: RBO@k = Σ_{d=1..k} (1−p)·p^(d−1)·|A_:d ∩ B_:d|/d
    — the top-weighted similarity of two result lists that needs NO
    relevance labels (compare WAND vs exact, vsm vs bm25, yesterday's
    index vs today's). This is the TRUNCATED sum (RBO_min, no residual
    extrapolation): identical prefixes score 1−p^k (≈0.6513 at k=10,
    p=0.9), NOT 1.0; disjoint lists score 0.0. Compare scores only
    against the same (k, p).

    The per-depth weights (1−p)·p^(d−1)/d are precomputed in Python and
    inlined as full-precision double literals on BOTH engine and oracle
    sides, so no pow() implementation difference can leak in; the final
    per-query sum is 6-dp rounded. Queries present in ``run_a`` always
    emit a row (0.0 when the lists are disjoint).

    Scale shape: both runs are top-k-per-query slices, so every join and
    the depth explode are result-set-sized (≤ k²·|queries| rows) —
    corpus-independent, like the other post-rankers."""
    if k < 1:
        raise ValueError("rbo_at_k: k must be >= 1")
    if not (0.0 < p < 1.0):
        raise ValueError("rbo_at_k: p must be in (0, 1)")
    weights = [(1.0 - p) * p ** (d - 1) / d for d in range(1, k + 1)]
    warr = F.array(*[F.lit(w) for w in weights])
    a = run_a.filter(F.col(rank_col) <= k).select(
        query_col, id_col, F.col(rank_col).alias("_ra")
    )
    b = run_b.filter(F.col(rank_col) <= k).select(
        query_col, id_col, F.col(rank_col).alias("_rb")
    )
    pairs = a.join(b, [query_col, id_col]).withColumn(
        "_d0", F.greatest("_ra", "_rb")
    )
    # a pair first counts at depth max(ra, rb); its total contribution is
    # Σ_{d=_d0..k} w_d — explode the tail depths and sum the inlined weights
    contrib = pairs.select(
        query_col,
        F.explode(F.sequence(F.col("_d0"), F.lit(k))).alias("_d"),
    ).select(query_col, F.element_at(warr, F.col("_d")).alias("_w"))
    per_q = contrib.groupBy(query_col).agg(F.round(F.sum("_w"), 6).alias("rbo"))
    universe = run_a.select(query_col).distinct()
    return universe.join(per_q, query_col, "left").select(
        query_col, F.coalesce(F.col("rbo"), F.lit(0.0)).alias("rbo")
    )
