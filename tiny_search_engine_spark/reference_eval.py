"""Replication of the reference's one published metric: NDCG@3 over its
labeled corpus (/root/reference/README.md:50-57).

The reference's whole quality methodology is a labeled set of 500 hot
queries x ~10 results each (`index/url.list.utf8`, 5020 rows,
`query \t title \t url \t label`, labels 0-2), scored NDCG@3 per engine
version:

    V0.1  cqr*ctr                       72.08  (492 q)
    v0.3  cqr*ctr + stopwords           73.58  (492 q)
    v0.6  vsm + stopwords               73.89  (491 q)
    v0.7  cqr*ctr + stopwords + syn     77.94  (494 q)

This module reruns the engine's full pipeline (build -> search -> rank)
over that exact corpus and computes the same metric. Exact parity with
the published numbers is IMPOSSIBLE from this checkout: the cppjieba
dictionary blobs are absent (`/root/reference/.MISSING_LARGE_BLOBS`), so
segmentation differs. The reproducible stand-in is the engine's
DictSearchTokenizer (jieba cut_for_search semantics, tokenizer.py) over
the one real Chinese wordlist the reference ships — the cilin_ex.utf8
synonym clusters (17,817 lines, also the SYN_DICT the reference loads,
conf/sys.conf:20) — plus `dict/stopword.utf8` (463 entries,
conf/sys.conf:10) as the stopword set. The resulting numbers are the
ENGINE'S OWN NDCG@3 on the reference's labeled data, recorded in
BASELINE.md beside the published rows with this tokenizer caveat.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .build import BuildConfig, SegmentStore, build_index
from .config import QueryConfig
from .eval import ndcg_at_k
from .query import QueryEngine
from .sources.tsv_corpus import load_tsv_corpus
from .tokenizer import DictSearchTokenizer, register_tokenizer

REF_DIR = "/root/reference"
REF_CORPUS = os.path.join(REF_DIR, "index", "url.list.utf8")
REF_CILIN = os.path.join(REF_DIR, "dict", "cilin_ex.utf8")
REF_STOPWORDS = os.path.join(REF_DIR, "dict", "stopword.utf8")

TOKENIZER_NAME = "dict_cilin_search"


def load_cilin_clusters(path: str = REF_CILIN) -> list[list[str]]:
    """`cluster_id term1 term2 ...` lines -> term clusters
    (synonyms.cpp:24-55 drops col 0; terms keep file order)."""
    out: list[list[str]] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            cols = line.split()
            if len(cols) >= 2:
                out.append(cols[1:])
    return out


def load_ref_stopwords(path: str = REF_STOPWORDS) -> frozenset[str]:
    """One term per line (table.cpp:122-141; blank lines skipped)."""
    with open(path, encoding="utf-8") as f:
        return frozenset(w for w in (line.rstrip("\n") for line in f) if w)


def register_cilin_tokenizer(
    clusters: list[list[str]] | None = None,
    seg_mode: str = "search",
) -> str:
    """Register the corpus tokenizer over the cilin wordlist. Idempotent;
    returns the registry name for BuildConfig/QueryEngine.

    ``seg_mode='search'`` — dictionary search-mode segmentation (jieba
    cut_for_search semantics), the default replication tokenizer.
    ``seg_mode='mp'`` — longest-match only (jieba MP/MIX-style coarse
    granularity, no 2/3-char sub-word enrichment): the VERDICT r4 ask #6
    experiment arm — synonym clusters are whole cilin words, so coarser
    segments give synonym expansion terms a chance to match whole-word
    postings instead of being diluted into sub-words."""
    from .tokenizer import DictTokenizer

    clusters = clusters if clusters is not None else load_cilin_clusters()
    vocab = {t for cl in clusters for t in cl}
    if seg_mode == "mp":
        name = TOKENIZER_NAME + "_mp"
        register_tokenizer(name, DictTokenizer(vocab))
        return name
    if seg_mode != "search":
        raise ValueError(f"unknown seg_mode {seg_mode!r}")
    register_tokenizer(TOKENIZER_NAME, DictSearchTokenizer(vocab))
    return TOKENIZER_NAME


def reference_source_df(spark: SparkSession, corpus_path: str = REF_CORPUS) -> DataFrame:
    """Last-version-per-url TSV rows reshaped into the engine's source
    schema: repo=url (the natural key), content=title. The reference keys
    docs by hash(url) with last-line-wins forward semantics
    (table.cpp:171,264); ghost first-version postings (the corruption
    quirk tsv_corpus replicates) are deliberately NOT replayed here — the
    quality metric should score the engine's clean index."""
    versions = load_tsv_corpus(spark, corpus_path)
    return versions.filter("is_last_version").select(
        F.col("url").alias("repo"),
        F.lit("").alias("path"),
        F.lit("").alias("commit"),
        F.lit("zh").alias("lang"),
        F.col("title").alias("content"),
    )


def reference_labels(
    spark: SparkSession,
    queries: list[tuple[int, str]],
    corpus_path: str = REF_CORPUS,
) -> DataFrame:
    """(query_id, doc_id, label) with doc_id derived EXACTLY like the
    engine build derives it (join through the rebuilt source rows), so
    ranked output and labels can never drift on id scheme. Duplicate
    (query, url) lines: last label wins (forward-table analog)."""
    from .build import with_doc_id

    versions = load_tsv_corpus(spark, corpus_path)
    qmap = spark.createDataFrame(queries, "query_id long, query string")
    ids = (
        with_doc_id(reference_source_df(spark, corpus_path))
        .select(F.col("repo").alias("url"), "doc_id")
    )
    lab = (
        versions.filter(F.col("label").isNotNull())
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("query", "url").orderBy(F.desc("line_id"))
            ),
        )
        .filter("_rn = 1")
        .select("query", "url", "label")
    )
    return (
        lab.join(F.broadcast(qmap), "query")
        .join(ids, "url")
        .select("query_id", "doc_id", "label")
    )


def reference_queries(spark: SparkSession, corpus_path: str = REF_CORPUS) -> list[tuple[int, str]]:
    """The 500 distinct queries, id'd by first-appearance line order
    (deterministic)."""
    versions = load_tsv_corpus(spark, corpus_path)
    rows = (
        versions.groupBy("query")
        .agg(F.min("line_id").alias("first_line"))
        .orderBy("first_line")
        .collect()
    )
    return [(i, r["query"]) for i, r in enumerate(rows)]


def build_reference_store(
    spark: SparkSession,
    out_dir: str,
    corpus_path: str = REF_CORPUS,
    use_stopwords: bool = True,
    seg_mode: str = "search",
) -> SegmentStore:
    """Build the engine index over the reference corpus with the cilin
    tokenizer (and optionally the reference stopword list — V0.1's row
    predates stopwords, so that variant builds without them).
    ``seg_mode`` picks the segmentation granularity (see
    register_cilin_tokenizer)."""
    name = register_cilin_tokenizer(seg_mode=seg_mode)
    stop = load_ref_stopwords() if use_stopwords else frozenset()
    return build_index(
        spark,
        reference_source_df(spark, corpus_path),
        out_dir,
        BuildConfig(tokenizer=name, stopwords=stop),
    )


def engine_ndcg3_ltr(
    spark: SparkSession,
    store: SegmentStore,
    queries: list[tuple[int, str]],
    labels: DataFrame,
    k: int = 20,
) -> tuple[float, int]:
    """NDCG@3 with the reference's SHIPPED xgboost LTR model as the
    final ranker (the '#ifdef XGBOOST on' configuration the reference
    never published a row for): engine D11 feature maps -> pure-python
    legacy-binary forest (ltr.load_xgb_model) -> distributed rerank.
    NB the model was trained on jieba-segmented feature distributions;
    under the cilin stand-in tokenizer its input distribution shifts, so
    scoring BELOW the hand scorers here is the expected honest outcome,
    not a reader bug (the reader itself is margin-pinned in
    tests/test_misc_parity.py)."""
    from . import ltr

    register_cilin_tokenizer()
    eng = QueryEngine(
        spark,
        store,
        QueryConfig(profile="reference", compat="reference", emit_features=True),
    )
    feats = eng.search(queries, k=k).select("query_id", "doc_id", "features")
    model = ltr.load_xgb_model(os.path.join(REF_DIR, "dict", "xgb.ltr.model"))
    ranked = ltr.rerank(feats, model, ltr.load_feature_conf(), k=k)
    return _mean_over_scorable(ndcg_at_k(ranked, labels, k=3), labels)


def _mean_over_scorable(per_q: DataFrame, labels: DataFrame) -> tuple[float, int]:
    """Mean NDCG over ALL queries with a positive label: a scorable
    query the engine returned nothing for scores 0 (left join +
    coalesce) rather than silently dropping out of the mean — dropping
    would INFLATE the metric exactly when retrieval fails hardest."""
    pos = labels.filter("label > 0").select("query_id").distinct()
    row = (
        pos.join(per_q, "query_id", "left")
        .agg(
            F.avg(F.coalesce("ndcg", F.lit(0.0))).alias("m"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    return (float(row["m"]) * 100.0, int(row["n"]))


def engine_ndcg3(
    spark: SparkSession,
    store: SegmentStore,
    queries: list[tuple[int, str]],
    labels: DataFrame,
    ranker: str,
    use_synonyms: bool = False,
    k: int = 20,
) -> tuple[float, int]:
    """Mean NDCG@3 over queries with a non-empty ideal ranking (idcg>0 —
    the reference's own 491-494-of-500 counts show zero-gain queries were
    excluded), plus that query count. k=20 = MAX_RESULT_NUM
    (conf/sys.conf:35)."""
    register_cilin_tokenizer()
    syn = load_cilin_clusters() if use_synonyms else None
    eng = QueryEngine(
        spark,
        store,
        QueryConfig(profile="reference", compat="reference", ranker=ranker),
        synonyms=syn,
    )
    ranked = eng.search(queries, k=k)
    # scorable = labeled queries with idcg > 0 (the reference's shrunken
    # 491-494 counts); zero-result scorable queries score 0, not dropped
    return _mean_over_scorable(ndcg_at_k(ranked, labels, k=3), labels)
