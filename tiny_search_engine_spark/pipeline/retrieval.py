"""Positional and document-similarity retrieval over the documents table:
phrase matching and more-like-this.

The reference retrieves by unordered term recall only (posting OR-merge,
/root/reference/src/table.cpp:430-470); it stores term offsets but never
uses adjacency (the computed-but-unused ``pre_term_sign``,
segment.cpp:84-99). These operators are the Spark-native completion of
that positional machinery — both are pure column algebra with exact
DuckDB oracles.

Scale shape:

* ``phrase_match`` — the classic anchor trick turns k-way positional
  self-joins into ONE broadcast join + ONE aggregation: a token at
  position p matching phrase slot s votes for anchor p − s; an anchor
  with all k distinct slots is a phrase occurrence. Shuffle volume is
  bounded by occurrences of the phrase vocabulary (a semi-join-sized
  slice of the corpus), never the corpus itself; the aggregation key
  (query, doc, anchor) is high-cardinality and unskewed.
* ``more_like_this`` — tf-idf cosine of seed docs against the corpus.
  The seed side is capped to its ``max_query_terms`` highest-weight
  terms (Lucene MLT's guard, default 25) and broadcast, so the dot
  product is one broadcast join + one aggregation regardless of corpus
  size; hot boilerplate terms are additionally prunable with
  ``min_idf``. Ranks by the ROUNDED similarity with a doc-id tie-break
  so the ordering is reproducible bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens_view


def phrase_match(
    docs: DataFrame,
    phrases: list[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Exact phrase search: docs containing the phrase terms at strictly
    consecutive positions, ranked per query by occurrence count
    (ties → lowest doc id). *phrases* is [(query_id, "w1 w2 ...")].

    Returns (query_id, rank, doc_id, n_occurrences)."""
    spark = docs.sparkSession
    slot_rows = []
    for qid, p in phrases:
        terms = [t for t in p.split() if t]
        if not terms:
            continue
        slot_rows += [(int(qid), s, t, len(terms)) for s, t in enumerate(terms)]
    slots = spark.createDataFrame(
        slot_rows, "query_id long, slot int, term string, n_slots int"
    )
    toks = tokens_view(docs, id_col=id_col, text_col=text_col)
    anchored = (
        toks.join(F.broadcast(slots), "term")
        .select(
            "query_id",
            F.col(id_col),
            (F.col("pos") - F.col("slot")).alias("anchor"),
            "slot",
            "n_slots",
        )
        .filter(F.col("anchor") >= 0)
    )
    occurrences = (
        anchored.groupBy("query_id", id_col, "anchor", "n_slots")
        .agg(F.countDistinct("slot").alias("_ns"))
        .filter(F.col("_ns") == F.col("n_slots"))
        .groupBy("query_id", id_col)
        .agg(F.count("*").alias("n_occurrences"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_occurrences").desc(), F.col(id_col).asc()
    )
    return (
        occurrences.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "n_occurrences")
    )


def more_like_this(
    docs: DataFrame,
    seed_ids: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    max_query_terms: int = 25,
    min_idf: float = 0.0,
) -> DataFrame:
    """Top-k most similar docs per seed doc by tf-idf cosine
    (wei = tf · ln(1 + N/df)), excluding the seed itself.

    Returns (seed_id, rank, doc_id, sim) with sim rounded to 4 decimals
    (the rank is computed OVER the rounded value + doc-id tie-break, so
    it is engine-reproducible)."""
    n = docs.count()
    tf = (
        tokens_view(docs, id_col=id_col, text_col=text_col)
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    stats = tf.groupBy("term").agg(F.count("*").alias("df"))
    wei = (
        tf.join(stats, "term")
        .withColumn("idf", F.log(F.lit(1.0) + F.lit(float(n)) / F.col("df")))
        .filter(F.col("idf") >= min_idf)
        .withColumn("wei", F.col("tf") * F.col("idf"))
        .select(id_col, "term", "wei")
    )
    norms = wei.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("wei") * F.col("wei"))).alias("norm")
    )
    sw = Window.partitionBy(id_col).orderBy(F.col("wei").desc(), F.col("term").asc())
    seed = (
        wei.filter(F.col(id_col).isin([int(s) for s in seed_ids]))
        .withColumn("_r", F.row_number().over(sw))
        .filter(F.col("_r") <= max_query_terms)
        .join(norms, id_col)
        .select(
            F.col(id_col).alias("seed_id"),
            "term",
            F.col("wei").alias("swei"),
            F.col("norm").alias("snorm"),
        )
    )
    sims = (
        wei.join(F.broadcast(seed), "term")
        .filter(F.col(id_col) != F.col("seed_id"))
        .groupBy("seed_id", id_col)
        .agg(
            F.sum(F.col("wei") * F.col("swei")).alias("dot"),
            F.first("snorm").alias("snorm"),  # constant within the group
        )
        .join(norms, id_col)
        .select(
            "seed_id",
            id_col,
            F.round(F.col("dot") / (F.col("norm") * F.col("snorm")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("seed_id").orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("seed_id", "rank", id_col, "sim")
    )
