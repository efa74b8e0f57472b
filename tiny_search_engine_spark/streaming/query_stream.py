"""Streaming query serving: the reference's interactive stdin loop
(/root/reference/src/main.cpp:75-90) re-expressed as Structured Streaming.

A query stream (files of ``query_id, query`` rows) is answered in
micro-batches against a built segment store: each batch runs the batched
block-max WAND path (query.py wand_topk — posting bytes shuffle once per
doc group, never per query, so a batch of thousands of queries costs one
index-slice pass), and results land in a parquet sink partitioned by
epoch. ``availableNow`` drains the backlog and stops — the pattern tests
use; a production server runs the same code with a processing-time
trigger.

foreachBatch is the right tool here (not a stateful operator): serving is
a pure per-batch join against static state (the store), there is no
cross-batch state to manage, and the sink write is idempotent per epoch
(mode=overwrite into an epoch=N directory), so retried epochs do not
duplicate results.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

QUERY_SCHEMA = "query_id long, query string"


def serve_query_stream(
    spark: SparkSession,
    engine,
    source_dir: str,
    out_dir: str,
    k: int = 20,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Answer a file-based query stream against *engine*'s store.

    Each epoch writes ``out_dir/epoch=N/`` (idempotent overwrite). Returns
    the StreamingQuery; with ``available_now`` the caller should
    ``awaitTermination()`` it.
    """
    stream = spark.readStream.schema(QUERY_SCHEMA).parquet(source_dir)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        queries = [(int(r.query_id), r.query or "") for r in batch_df.collect()]
        if not queries:
            return
        res = engine.wand_topk(queries, k=k)
        res.write.mode("overwrite").parquet(os.path.join(out_dir, f"epoch={epoch_id}"))

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation",
        checkpoint_dir or os.path.join(out_dir, "_checkpoint"),
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_results(spark: SparkSession, out_dir: str) -> DataFrame:
    """All epochs' results as one DataFrame."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "epoch=*")
    )
