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
distinct side to HLL sketches (computed straight off the stacked rows,
no census dependency), and ``min_count`` prunes the top-k census to
values surviving the map-side partial agg — together they bound the
exchange the way ``paragraph_dedup``'s boilerplate collapse does.

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
    min_count: int = 1,
) -> DataFrame:
    """Per-column profile: (col_name, n_rows, n_nulls, n_distinct, rank,
    value, n) — one row per top-k value, summary stats repeated.
    ``approx`` uses HLL (approx_count_distinct) for n_distinct — the
    mergeable-sketch path for 100 TB tables. ``min_count`` prunes the
    top-k census to values seen at least that often (the summary is
    computed directly from the stacked rows, so pruning never skews
    n_rows/n_nulls/n_distinct); with min_count > 1 the census exchange
    carries only the post-partial-agg survivors."""
    if k < 1:
        raise ValueError("profile_table: k must be >= 1")
    if min_count < 1:
        raise ValueError("profile_table: min_count must be >= 1")
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
    distinct_agg = (
        F.approx_count_distinct("value")
        if approx
        else F.count_distinct("value")
    )
    # summary straight from the stacked rows (map-side partials to one row
    # per column) — it never depends on the census, so min_count pruning
    # can't skew it
    summary = stacked.groupBy("col_name").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("n_nulls"),
        distinct_agg.alias("n_distinct"),  # count(_distinct) skips NULLs on both engines
    )
    census = stacked.groupBy("col_name", "value").agg(F.count("*").alias("n"))
    if min_count > 1:
        census = census.filter(F.col("n") >= min_count)
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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    cmp_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data-capture diff between two snapshots of a table: every
    id classified as ``added`` / ``removed`` / ``changed`` / ``unchanged``
    by comparing an md5 fingerprint of the compare columns — what an
    incremental pipeline consults to reprocess ONLY the delta (the batch
    twin of streaming/ingest.py's upsert/delete path, and the first step
    of any 100 TB backfill-vs-refresh decision).

    Fingerprints use a 0x1f column separator and a presence-marker
    encoding — NULL → \"0\", value v → \"1\" + v — so NULL is
    distinguishable from EVERY string value (including one that happens
    to equal a bare sentinel byte), and (\"a\", NULL) and (\"a\\x1f0\",)
    still differ via the marker prefix. Returns (id, status, old_fp,
    new_fp) for ALL ids in either snapshot; filter
    ``status != 'unchanged'`` for the work list.

    Scale shape: one select per side, ONE id-keyed full-outer sort-merge
    join — at 100 TB both sides bucket by id (the segment store's
    layout) so the join co-locates without a shuffle; no skew (ids are
    unique per side)."""
    cmp = cmp_cols or [c for c in new.columns if c != id_col and c in old.columns]
    if not cmp:
        raise ValueError("snapshot_diff: no compare columns")

    def fp(df: DataFrame, alias: str) -> DataFrame:
        parts = [
            F.when(F.col(c).isNull(), F.lit("0")).otherwise(
                F.concat(F.lit("1"), F.col(c).cast("string"))
            )
            for c in cmp
        ]
        return df.select(F.col(id_col), F.md5(F.concat_ws("\x1f", *parts)).alias(alias))

    o = fp(old, "old_fp")
    n = fp(new, "new_fp")
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(id_col, status.alias("status"), "old_fp", "new_fp")
