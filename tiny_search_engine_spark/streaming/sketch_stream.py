"""Streaming heavy hitters: maintain a count-min sketch over the ingest
stream and register every term the moment its estimate crosses the
threshold.

The streaming twin of ``pipeline/selection.heavy_hitters`` — the sketch
construction and estimation are SHARED (``selection.cms_rows`` /
``cms_estimate``), so the hash lanes cannot drift between batch and
stream. CMS is MERGEABLE: summing (r, bucket) cells across epochs gives
exactly the sketch of the union corpus, which is why the per-epoch state
is a bounded ≤ depth·width-row parquet delta and never a vocabulary.

Registration invariant (pinned in tests): a term whose TRUE total count
ever reaches the threshold is registered in the epoch its deciding
occurrence lands — when its last occurrence is merged, the estimate is
≥ its true total (CMS never underestimates), so the batch-local
candidate scan that epoch must see it. The candidate union is therefore
a SUPERSET of the true heavy hitters regardless of sketch size;
estimates carry the usual CMS one-sided error (exact when the sketch is
collision-free). For exact counts, ``confirm_heavy_hitters`` replays
the batch operator's narrow-then-recount pass over the accumulated
corpus.

Ingest discipline mirrors the other streams (ingest.py, dedup_stream.py,
percolate_stream.py): ``availableNow`` drains currently-visible files
and stops; the checkpoint makes re-invocation process only NEW files;
per-epoch state lands with mode=overwrite into ``seq=epoch+1`` dirs so a
retried epoch is byte-identical (the epoch's sketch delta is a pure
function of its batch).

Scale shape: per epoch, one bounded-census shuffle (≤ depth·width keys)
+ one distinct over the BATCH's terms (micro-batch-sized) + d broadcast
joins of the merged bounded sketch. Nothing grows with history except
the candidate registry, which is capped by the threshold itself
(≤ total_tokens / threshold true hitters can exist).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.selection import cms_estimate, cms_rows
from ..pipeline.textstats import _lower_tokens

STREAM_SCHEMA = "doc_id long, text string"

_CMS_SCHEMA = "r int, bucket long, c long"
_CAND_SCHEMA = "term string"


def _cms_root(store_path: str) -> str:
    return os.path.join(store_path, "cms")


def _cand_root(store_path: str) -> str:
    return os.path.join(store_path, "candidates")


def _seq_dirs(root: str, upto: int | None = None) -> list[str]:
    if not os.path.isdir(root):
        return []
    out = []
    for name in sorted(os.listdir(root)):
        if not name.startswith("seq="):
            continue
        n = int(name.split("=", 1)[1])
        if upto is None or n <= upto:
            out.append(os.path.join(root, name))
    return out


def hh_ingest_available_now(
    spark: SparkSession,
    source_dir: str,
    store_path: str,
    checkpoint_dir: str,
    threshold: int,
    depth: int = 4,
    width: int = 512,
    schema: str = STREAM_SCHEMA,
    text_col: str = "text",
) -> int:
    """Drain all currently-available files from *source_dir*, folding each
    epoch into the sketch store and registering newly-crossed heavy-hitter
    candidates. Returns the number of epochs applied."""
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    stream = spark.readStream.schema(schema).parquet(source_dir)
    n_epochs = {"n": 0}

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        seq = int(epoch_id) + 1
        cdir = os.path.join(_cms_root(store_path), f"seq={seq}")
        kdir = os.path.join(_cand_root(store_path), f"seq={seq}")
        tok = batch_df.select(
            F.explode(_lower_tokens(text_col)).alias("term")
        )
        # epoch sketch delta (bounded; overwrite ⇒ idempotent retry)
        cms_rows(tok, depth, width).write.mode("overwrite").parquet(cdir)
        # merged sketch so far = sum of deltas ≤ this seq (on retry,
        # later seqs don't exist — availableNow epochs are sequential)
        merged = (
            spark.read.parquet(*_seq_dirs(_cms_root(store_path), upto=seq))
            .groupBy("r", "bucket")
            .agg(F.sum("c").alias("c"))
            .localCheckpoint()
        )
        cand = (
            cms_estimate(tok.distinct(), merged, depth, width)
            .filter(F.col("_est") >= threshold)
            .select("term")
        )
        cand.write.mode("overwrite").parquet(kdir)
        n_epochs["n"] += 1

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_epochs["n"]


def stream_sketch(spark: SparkSession, store_path: str) -> DataFrame:
    """The merged (r, bucket, c) sketch of everything ingested so far."""
    dirs = _seq_dirs(_cms_root(store_path))
    if not dirs:
        return spark.createDataFrame([], _CMS_SCHEMA)
    return (
        spark.read.parquet(*dirs).groupBy("r", "bucket").agg(F.sum("c").alias("c"))
    )


def stream_heavy_hitters(
    spark: SparkSession, store_path: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """(term, est) for every registered candidate, estimated against the
    CURRENT merged sketch. Superset of the true heavy hitters; est ≥ true
    count always, exact when the sketch is collision-free."""
    dirs = _seq_dirs(_cand_root(store_path))
    if not dirs:
        return spark.createDataFrame([], "term string, est long")
    cand = spark.read.parquet(*dirs).distinct()
    merged = stream_sketch(spark, store_path).localCheckpoint()
    return cms_estimate(cand, merged, depth, width).select(
        "term", F.col("_est").cast("long").alias("est")
    )


def confirm_heavy_hitters(
    docs: DataFrame,
    candidates: DataFrame,
    threshold: int,
    text_col: str = "text",
) -> DataFrame:
    """Exact recount of the registered candidates over the accumulated
    corpus — the batch operator's confirm pass: output is exactly
    ``HAVING count(*) >= threshold`` because registration never misses a
    true hitter."""
    tok = docs.select(F.explode(_lower_tokens(text_col)).alias("term"))
    return (
        tok.join(F.broadcast(candidates.select("term").distinct()), "term", "left_semi")
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= threshold)
    )
