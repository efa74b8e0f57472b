"""Watermarked streaming window aggregation over an event stream.

The batch form of this plan lives in ``pipeline/events.windowed_stats``
(same tumbling window, same aggregates); this module runs it as a real
Structured Streaming query: ``readStream`` → ``withWatermark`` →
windowed ``groupBy`` → append-mode parquet sink. Append mode only emits
a window once the watermark passes its end — i.e. once late data within
the allowed lateness can no longer change it — which is exactly the
"late data" semantics the batch oracle cannot express; the test drives
it by feeding epochs whose max event time advances the watermark and
checking the finalized windows against the batch operator.

One deviation from batch, forced by the engine: exact
``countDistinct`` is unsupported in streaming aggregations (state would
need every user id per open window), so the stream reports
``approx_count_distinct`` (HLL++) — at 100 TB that is also the right
call for the batch path whenever an estimate is acceptable.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_stats_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    schema: str = EVENT_SCHEMA,
) -> None:
    """Drain all currently-available event files through a watermarked
    tumbling-window aggregation into an append-mode parquet sink.

    Exactly-once: the checkpoint tracks consumed files AND the window
    state; re-running after more files land emits only newly-finalized
    windows. Restartable mid-stream (state lives in the checkpoint)."""
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")  # epochs land as subdirs
        .parquet(source_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
            F.round(
                F.avg(F.get_json_object("props", "$.k").cast("double")), 6
            ).alias("avg_k"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users_approx",
            "avg_k",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
