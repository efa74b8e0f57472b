"""Streaming maintenance of the trigram code-search index: drain new /
replaced / deleted docs from a directory source into epoch-keyed delta
segments of a persisted trigram store (pipeline/codesearch.py).

Mirrors the segment store's streaming ingest (streaming/ingest.py):
``availableNow`` drains everything currently visible and stops; the
checkpoint tracks consumed files so a second invocation only processes
NEW files.  Exactly-once: each foreachBatch epoch writes its delta dir
with mode=overwrite and rewrites its own tombstone slot, both keyed by
``seq = epoch_id + 1`` — a retried epoch lands byte-identically
(update_trigram_store's idempotent-seq contract).

Deletes ride the stream as rows with ``deleted = true`` (text ignored);
replacements are just new rows for an existing doc id — the per-seq
tombstone scheme keeps the fresh postings and kills every older copy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.codesearch import update_trigram_store

STREAM_SCHEMA = "doc_id long, text string, deleted boolean"


def trigram_ingest_available_now(
    spark: SparkSession,
    source_dir: str,
    store_path: str,
    checkpoint_dir: str,
    schema: str = STREAM_SCHEMA,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Drain all currently-available files from *source_dir* into the
    trigram store at *store_path*.  Returns the number of epochs applied."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    n_epochs = {"n": 0}

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if "deleted" in batch_df.columns:
            dels = [
                r[0]
                for r in batch_df.filter(F.col("deleted")).select(id_col).collect()
            ]
            live = batch_df.filter(~F.coalesce(F.col("deleted"), F.lit(False)))
        else:
            dels, live = [], batch_df
        update_trigram_store(
            live.select(id_col, text_col),
            store_path,
            deleted_ids=dels,
            id_col=id_col,
            text_col=text_col,
            seq=int(epoch_id) + 1,
        )
        n_epochs["n"] += 1

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_epochs["n"]
