"""Streaming near-duplicate detection: maintain a persisted MinHash-LSH
bucket store as documents arrive, and emit each epoch exactly the NEW
candidate pairs — new docs vs everything seen so far, plus intra-batch.

The streaming twin of ``pipeline/dedup.lsh_candidate_pairs`` (band
construction is SHARED via ``dedup.lsh_band_rows``, so the bucket keys
cannot drift between the batch and streaming paths). Mirrors the
segment/trigram stores' ingest discipline (streaming/ingest.py,
trigram_stream.py): ``availableNow`` drains everything currently
visible and stops; the checkpoint tracks consumed files so a second
invocation only processes NEW files. Exactly-once: each epoch writes
its bucket rows and its pair delta with mode=overwrite into dirs keyed
by ``seq = epoch_id + 1``, and the pair join reads only seqs < its own
— a retried epoch lands byte-identically.

Pair-uniqueness invariant (pinned in tests): a candidate pair is
emitted in EXACTLY the epoch its later-arriving member lands in —
intra-batch pairs by the (a < b) self-join, cross pairs by joining the
batch's bucket rows against all PRIOR seqs' rows — so the union of all
pair deltas equals the batch ``lsh_candidate_pairs`` over the union of
all documents, with no per-epoch recomputation of history. Doc ids are
assumed append-only (replacements belong to the compacting stores).

Scale shape: the per-epoch cost is (batch bands) ⋈ (bucket store), an
equi-join on (band, band_key) — the store side at 100 TB is parquet
partitioned so the join shuffles bucket rows, never documents, and a
production deployment would additionally bucket the store by
pmod(xxhash64(band_key)) (the trigram store's layout) to co-locate the
join; hot boilerplate buckets behave like hot terms under AQE skew
handling, same as the batch path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.dedup import lsh_band_rows

STREAM_SCHEMA = "doc_id long, text string"

_BANDS_SCHEMA = "doc_id long, band int, band_key string"
_PAIRS_SCHEMA = "id_a long, id_b long"


def _buckets_root(store_path: str) -> str:
    return os.path.join(store_path, "buckets")


def _pairs_root(store_path: str) -> str:
    return os.path.join(store_path, "pairs")


def _seq_dirs(root: str, below: int | None = None) -> list[str]:
    """seq=N child dirs of *root*, optionally only N < below."""
    if not os.path.isdir(root):
        return []
    out = []
    for name in sorted(os.listdir(root)):
        if not name.startswith("seq="):
            continue
        n = int(name.split("=", 1)[1])
        if below is None or n < below:
            out.append(os.path.join(root, name))
    return out


def dedup_ingest_available_now(
    spark: SparkSession,
    source_dir: str,
    store_path: str,
    checkpoint_dir: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle: int = 3,
    schema: str = STREAM_SCHEMA,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Drain all currently-available files from *source_dir* into the LSH
    bucket store at *store_path*, writing per-epoch pair deltas. Returns
    the number of epochs applied. As with the other ingests, pass a glob
    (``".../inbox/*"``) when arrivals land as per-batch subdirectories."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    n_epochs = {"n": 0}

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        seq = int(epoch_id) + 1
        bdir = os.path.join(_buckets_root(store_path), f"seq={seq}")
        pdir = os.path.join(_pairs_root(store_path), f"seq={seq}")
        # land this epoch's bucket rows first (overwrite ⇒ idempotent
        # retry), then read them BACK for the joins so the shingle/minhash
        # pipeline runs once, not once per join branch
        lsh_band_rows(
            batch_df.select(id_col, text_col).withColumnRenamed(id_col, "doc_id")
            .withColumnRenamed(text_col, "text"),
            num_hashes=num_hashes, bands=bands, shingle=shingle,
        ).write.mode("overwrite").parquet(bdir)
        new_b = spark.read.parquet(bdir)

        a = new_b.alias("a")
        b = new_b.alias("b")
        intra = a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        pairs = intra
        prior_dirs = _seq_dirs(_buckets_root(store_path), below=seq)
        if prior_dirs:
            prior = spark.read.parquet(*prior_dirs).alias("o")
            nw = new_b.alias("nw")
            cross = prior.join(
                nw,
                (F.col("o.band") == F.col("nw.band"))
                & (F.col("o.band_key") == F.col("nw.band_key"))
                & (F.col("o.doc_id") != F.col("nw.doc_id")),
            ).select(
                F.least(F.col("o.doc_id"), F.col("nw.doc_id")).alias("id_a"),
                F.greatest(F.col("o.doc_id"), F.col("nw.doc_id")).alias("id_b"),
            )
            pairs = pairs.unionByName(cross)
        pairs.distinct().write.mode("overwrite").parquet(pdir)
        n_epochs["n"] += 1

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_epochs["n"]


def stream_pairs(spark: SparkSession, store_path: str) -> DataFrame:
    """All candidate pairs found so far (plain union of the per-epoch
    deltas — the exactly-once invariant makes them disjoint, so no
    distinct is needed or applied; tests pin that); equals batch
    lsh_candidate_pairs over the union of all ingested docs."""
    dirs = _seq_dirs(_pairs_root(store_path))
    if not dirs:
        return spark.createDataFrame([], _PAIRS_SCHEMA)
    return spark.read.parquet(*dirs)


def stream_buckets(spark: SparkSession, store_path: str) -> DataFrame:
    """The accumulated bucket membership table (doc_id, band, band_key)."""
    dirs = _seq_dirs(_buckets_root(store_path))
    if not dirs:
        return spark.createDataFrame([], _BANDS_SCHEMA)
    return spark.read.parquet(*dirs)
