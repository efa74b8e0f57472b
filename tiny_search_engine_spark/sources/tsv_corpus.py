"""A1: reference-shaped TSV corpus source (``query \\t title \\t url \\t label``).

Parser parity with /root/reference/src/table.cpp:147-187: ≥3 columns
required (short lines skipped), col0 (query) unused by the build, label
ignored, doc keyed by hash(url), title is the indexed text.

Duplicate-url semantics (the reference's effective, corruption-y behavior,
replicated deliberately — FIXTURES.md §3):

* forward table: LAST line wins (``forward_table[doc_sign] = doc_info``
  overwrite, table.cpp:264).
* inverted table: for each (doc, term), the posting/tf comes from the
  FIRST line of that url whose title contains the term
  (``term_info->docs.find(node) != end → skip``, table.cpp:284-290) —
  postings may therefore reference terms absent from the final title.

Distributed expression: line order = per-file read order captured with
``monotonically_increasing_id`` (valid for ordered text-file splits; at
production scale the corpus carries an explicit version/line column
instead), then two window ranks pick first-per-(url,term) and
last-per-url declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load_tsv_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Parse the TSV into versioned rows:
    (doc_id, url, title, line_id, version_rank, is_last_version).

    doc_id = xxhash64(url) (the reference's hash(url), table.cpp:171,
    rebased onto the engine's canonical sign function)."""
    raw = spark.read.text(path).withColumn("line_id", F.monotonically_increasing_id())
    parts = F.split(F.col("value"), "\t")
    rows = (
        raw.withColumn("n_cols", F.size(parts))
        .filter(F.col("n_cols") >= 3)  # short lines skipped, table.cpp:160-166
        .select(
            F.col("line_id"),
            parts.getItem(0).alias("query"),
            parts.getItem(1).alias("title"),
            parts.getItem(2).alias("url"),
            # col 3: relevance label — the reference parses then ignores it
            # (table.cpp:157-171); carried here so eval.ndcg_at_k can score
            # rankings the way the reference's README.md:50-57 methodology
            # does (NDCG@3 over the labeled corpus)
            F.when(F.col("n_cols") >= 4, parts.getItem(3).cast("int")).alias("label"),
        )
        .filter(F.length("title") > 0)
    )
    rows = rows.withColumn("doc_id", F.xxhash64(F.col("url")))
    w = Window.partitionBy("doc_id").orderBy("line_id")
    wd = Window.partitionBy("doc_id")
    return (
        rows.withColumn("version_rank", F.row_number().over(w))
        .withColumn("is_last_version", F.col("line_id") == F.max("line_id").over(wd))
    )


def tsv_index_tables(
    spark: SparkSession,
    versions: DataFrame,
    tokenizer_mode: str = "code",
    stopwords: frozenset[str] = frozenset(),
):
    """Quirk-faithful index tables from a versioned TSV corpus:

    returns (doc_term, term_stats, doc_stats) where per-(doc,term) tf comes
    from the FIRST version containing the term (inverted-table semantics)
    while doc stats come from the LAST version (forward-table semantics) —
    the reference's effective duplicate-url behavior (module docstring).
    """
    from ..hashing import term_sign
    from ..tokenizer import make_tokenize_iterator

    tok_fn = make_tokenize_iterator(tokenizer_mode, "vid", "title")
    # encode (doc_id, version_rank) into one id for the tokenizer pass
    with_vid = versions.withColumn(
        "vid", F.xxhash64(F.concat_ws(":", F.col("doc_id"), F.col("version_rank")))
    )
    vmap = with_vid.select("vid", "doc_id", "version_rank", "is_last_version")
    tokens = (
        with_vid.select("vid", "title")
        .mapInPandas(tok_fn, "vid long, pos int, term string, offset int, length int, dup int")
        .withColumn("term_sign", F.xxhash64(F.lower(F.col("term"))))
        .join(vmap, "vid")
    )
    if stopwords:
        stop_signs = [term_sign(w) for w in sorted(stopwords)]
        inv_tokens = tokens.filter(~F.col("term_sign").isin(stop_signs))
    else:
        inv_tokens = tokens
    per_version = inv_tokens.groupBy("doc_id", "term_sign", "version_rank").agg(
        F.count("*").alias("tf"), F.first("term").alias("term"),
        F.first("length").alias("term_len"),
    )
    w = Window.partitionBy("doc_id", "term_sign").orderBy("version_rank")
    doc_term = (
        per_version.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)  # first version containing the term wins
        .select("doc_id", "term_sign", "tf", "term", "term_len")
    )
    # N = forward-table size: docs with >=1 token (empty docs rejected,
    # table.cpp:270)
    n_docs_row = tokens.select("doc_id").distinct().count()
    diff = F.lit(float(n_docs_row)) - F.col("ttf")
    wrapped = (F.lit(float(2**64)) + diff).cast("float").cast("double") + 0.5
    term_stats = (
        doc_term.groupBy("term_sign")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("ttf"),
            F.first("term").alias("term"),
            F.first("term_len").alias("term_len"),
        )
        .withColumn(
            "idf",
            F.log(F.when(diff >= 0, diff + 0.5).otherwise(wrapped) / (F.col("ttf") + 0.5)),
        )
    )
    # forward side: LAST version only. Stopword occurrences get wei=0 for
    # free: they never entered term_stats, so idf coalesces to 0.
    last_tokens = tokens.filter(F.col("is_last_version"))
    occ = last_tokens.join(
        term_stats.select("term_sign", "idf"), "term_sign", "left"
    ).withColumn("wei", F.coalesce(F.col("idf"), F.lit(0.0)))
    doc_stats = occ.groupBy("doc_id").agg(
        F.count("*").alias("n_terms"),
        F.max_by(F.col("offset") + F.col("length"), F.col("pos")).alias("doc_len"),
        F.sqrt(F.sum(F.pow(F.col("wei"), F.lit(2.0)))).alias("vec_module"),
        F.sum("wei").alias("wei_sum"),
    )
    return doc_term, term_stats, doc_stats


def corpus_to_build_inputs(versions: DataFrame):
    """→ (forward_docs, posting_versions):

    forward_docs: one row per doc — the LAST version's title (what doc
    stats, weights and feature texts are computed from).

    posting_versions: all versions with version_rank — the posting builder
    takes, per (doc, term), the tf from the first version containing the
    term (build_index_tsv below)."""
    fwd = versions.filter(F.col("is_last_version")).select("doc_id", "url", "title")
    return fwd, versions.select("doc_id", "title", "version_rank")
