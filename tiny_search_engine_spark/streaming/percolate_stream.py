"""Streaming percolation (reverse search / saved-search alerting): match
each arriving document against a REGISTERED set of boolean queries and
emit the (query, doc) alert rows per epoch — the Elasticsearch
percolator surface, and the alerting twin of ``retrieval.boolean_search``
(the match SEMANTICS are literally that function applied to the epoch's
micro-batch, so batch and stream cannot drift).

Ingest discipline mirrors the other streams (ingest.py, trigram_stream,
dedup_stream): ``availableNow`` drains everything currently visible, the
checkpoint tracks consumed files, and each epoch writes its alert delta
with mode=overwrite into a ``seq = epoch_id + 1`` dir so a retried epoch
lands byte-identically. Percolation is per-document (no history join at
all), so epoch deltas are disjoint by construction and their union
equals the batch ``boolean_search`` over the union of all ingested docs
— pinned in tests.

Scale shape: the registered query table is dictionary-sized and
broadcast; per epoch the cost is one distinct (doc, term) projection of
the BATCH (never the history) joined against it — the cheapest possible
alerting pass. Alerts per query are unbounded in principle; ``max_hits``
caps the per-(query, epoch) emission by (n_matched desc, doc id) —
the same rank rule as the batch operator."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .dedup_stream import _seq_dirs

STREAM_SCHEMA = "doc_id long, text string"

_ALERTS_SCHEMA = "query_id long, rank int, doc_id long, n_matched int"


def _alerts_root(store_path: str) -> str:
    return os.path.join(store_path, "alerts")


def percolate_available_now(
    spark: SparkSession,
    source_dir: str,
    store_path: str,
    checkpoint_dir: str,
    queries: list[tuple[int, str]],
    schema: str = STREAM_SCHEMA,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hits: int = 1 << 30,
) -> int:
    """Drain all currently-available files from *source_dir*, percolating
    each epoch's documents through *queries* (``+must -not should``
    grammar — see retrieval.parse_boolean_queries). Returns the number of
    epochs applied."""
    from ..pipeline.retrieval import boolean_search

    stream = spark.readStream.schema(schema).parquet(source_dir)
    n_epochs = {"n": 0}

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        seq = int(epoch_id) + 1
        adir = os.path.join(_alerts_root(store_path), f"seq={seq}")
        matches = boolean_search(
            batch_df, queries, id_col=id_col, text_col=text_col, k=max_hits
        )
        matches.write.mode("overwrite").parquet(adir)
        n_epochs["n"] += 1

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_epochs["n"]


def stream_alerts(spark: SparkSession, store_path: str) -> DataFrame:
    """All alerts emitted so far (union of the per-epoch deltas — disjoint
    by construction since percolation is per-document). NOTE: ``rank`` is
    per-epoch (the rank among that epoch's matches), not global."""
    dirs = _seq_dirs(_alerts_root(store_path))
    if not dirs:
        return spark.createDataFrame([], _ALERTS_SCHEMA)
    return spark.read.parquet(*dirs)
