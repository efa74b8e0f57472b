"""Streaming corpus ingestion: Structured Streaming → delta segments →
compaction into the segment store.

The reference's only "incremental" surface is ``Table::add_index`` (insert
one doc into both in-memory tables, /root/reference/src/table.cpp:197-200;
``delete_index`` is declared but never defined, table.h:72). The Spark
re-expression is the standard search-engine shape: a document stream lands
as per-micro-batch **delta segments** (exactly-once via the streaming
checkpoint + idempotent epoch-keyed writes), and a **compaction** folds
base + deltas into a fresh segment store (global stats — idf, avg_doc_len —
are corpus-wide, so they are recomputed at compaction; per-epoch partial
postings merge is the round-2 refinement).

At 100 TB the same topology holds: deltas are small and bounded by
micro-batch size; compaction is the existing salted/sharded build over
``base ∪ deltas`` and is itself checkpoint-resumable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..build import BuildConfig, SegmentStore, build_index


def delta_dir(store_root: str) -> str:
    return os.path.join(store_root, "deltas")


def ingest_available_now(
    spark: SparkSession,
    source_dir: str,
    store_root: str,
    checkpoint_dir: str,
    schema: str = "repo string, path string, commit string, lang string, content string",
) -> int:
    """Drain all currently-available files from *source_dir* into epoch-keyed
    delta segments under the store. Returns the number of epochs written.

    Exactly-once: the checkpoint tracks consumed files; each epoch writes to
    its own directory with mode=overwrite, so foreachBatch retries are
    idempotent."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    n_epochs = {"n": 0}

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        out = os.path.join(delta_dir(store_root), f"epoch={epoch_id}")
        batch_df.write.mode("overwrite").parquet(out)
        n_epochs["n"] += 1

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_epochs["n"]


def compact(
    spark: SparkSession,
    base_source: DataFrame | None,
    store_root: str,
    out_dir: str,
    cfg: BuildConfig | None = None,
) -> SegmentStore:
    """Fold base corpus + all delta segments into a fresh segment store.

    Corpus-global statistics (total-tf idf, avg_doc_len, doc weights) make
    per-segment incremental stat merge unsound without a stats-merge pass,
    so compaction recomputes them via the normal (resumable, salted)
    build over the unioned source."""
    dd = delta_dir(store_root)
    parts = []
    if base_source is not None:
        parts.append(base_source)
    if os.path.isdir(dd) and any(e.startswith("epoch=") for e in os.listdir(dd)):
        deltas = spark.read.parquet(dd).select(
            "repo", "path", "commit", "lang", "content"
        )
        parts.append(deltas)
    if not parts:
        raise ValueError("nothing to compact: no base source and no deltas")
    src = parts[0]
    for p in parts[1:]:
        src = src.unionByName(p)
    return build_index(spark, src, out_dir, cfg)
