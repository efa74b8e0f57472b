"""Sequence packing: concatenate documents (in deterministic doc_id
order) into fixed-length training chunks and emit the (chunk, doc)
segment map — the concat-and-chunk step every LLM pretraining pipeline
runs between curation and tokenized-shard writing.

The global token offset of each doc is a prefix sum over the corpus
order. A naive ``Window.orderBy(doc_id)`` with no partition key plans as
ONE reducer holding the whole corpus — the exact shape the curate()
docstring warns about — so this module implements the textbook
distributed scan instead:

1. split the id space into ordered buckets: bucket(id) = number of
   boundary values < id, with boundaries from one approx-quantile agg.
   The bucket is a pure MONOTONE function of doc_id, so correctness
   never depends on where the sampled boundaries land (they only set
   the balance) — deliberately NOT ``spark_partition_id()`` after a
   range repartition, which is only consistent across the two reads of
   the exchange if Catalyst happens to reuse it;
2. per-bucket running sum via a window PARTITIONED by bucket (bounded
   by bucket size, runs everywhere in parallel);
3. per-bucket totals (one row per bucket — hundreds of rows at any
   scale) get their own tiny prefix sum and are broadcast back as base
   offsets.

The emitted values are independent of the bucketing, so the result is
partitioning-invariant (pinned in tests) and the DuckDB oracle is a
plain single-node window cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import _lower_tokens


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_len: int = 128,
    n_buckets: int | None = None,
) -> DataFrame:
    """Segment map of the packed corpus: one row per (chunk_id, doc)
    overlap with ``doc_offset`` (first token of the segment within the
    doc), ``chunk_offset`` (its position within the chunk) and
    ``seg_len``. Every chunk except the last sums to exactly
    ``chunk_len`` tokens; docs longer than a chunk span several rows.
    Zero-token docs are dropped (they contribute nothing to training
    sequences)."""
    dl = df.select(
        F.col(id_col), F.size(_lower_tokens(text_col)).cast("long").alias("n_tokens")
    )
    return pack_from_lengths(dl, id_col=id_col, chunk_len=chunk_len, n_buckets=n_buckets)


def pack_from_lengths(
    dl: DataFrame,
    id_col: str = "doc_id",
    chunk_len: int = 128,
    n_buckets: int | None = None,
) -> DataFrame:
    """The packing core over a pre-computed (id, n_tokens) frame — used
    directly by shards.write_training_shards, whose token counts come
    from an arbitrary registry tokenizer rather than the whitespace
    rule."""
    if chunk_len <= 0:
        raise ValueError("chunk_len must be positive")
    if n_buckets is not None and n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    dl = dl.filter(F.col("n_tokens") > 0)
    spark = dl.sparkSession
    p = n_buckets or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # one tiny agg for the boundary sample (values, not positions, so any
    # sample is correct); empty corpus -> no boundaries -> single bucket
    qs = [i / p for i in range(1, p)]
    row = dl.agg(F.percentile_approx(id_col, qs, 1000).alias("b")).collect()[0]
    bounds = sorted(set(row["b"] or []))
    if bounds:
        barr = F.array(*[F.lit(int(b)).cast("long") for b in bounds])
        bucket = F.size(F.filter(barr, lambda b: b < F.col(id_col)))
    else:
        bucket = F.lit(0)
    keyed = dl.withColumn("_bkt", bucket)
    w_local = Window.partitionBy("_bkt").orderBy(F.col(id_col).asc())
    local = keyed.withColumn(
        "_local_cum", F.sum("n_tokens").over(w_local) - F.col("n_tokens")
    )
    totals = keyed.groupBy("_bkt").agg(F.sum("n_tokens").alias("_tot"))
    w_base = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    bases = totals.withColumn(
        "_base", F.coalesce(F.sum("_tot").over(w_base), F.lit(0).cast("long"))
    ).select("_bkt", "_base")
    off = local.join(F.broadcast(bases), "_bkt").withColumn(
        "_off", F.col("_local_cum") + F.col("_base")
    )
    ln = F.lit(int(chunk_len)).cast("long")
    first_c = F.floor(F.col("_off") / ln)
    last_c = F.floor((F.col("_off") + F.col("n_tokens") - 1) / ln)
    seg = off.select(
        F.col(id_col),
        "n_tokens",
        "_off",
        F.explode(F.sequence(first_c, last_c)).alias("chunk_id"),
    )
    seg_start = F.greatest(F.col("_off"), F.col("chunk_id") * ln)
    seg_end = F.least(F.col("_off") + F.col("n_tokens"), (F.col("chunk_id") + 1) * ln)
    return seg.select(
        F.col("chunk_id"),
        F.col(id_col),
        (seg_start - F.col("_off")).alias("doc_offset"),
        (seg_start - F.col("chunk_id") * ln).alias("chunk_offset"),
        (seg_end - seg_start).alias("seg_len"),
    )
