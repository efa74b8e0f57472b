"""Event-stream analytics operators: sessionization, tumbling-window
aggregation, JSON property extraction.

The reference's only "event stream" is the interactive stdin query loop
(/root/reference/src/main.cpp:75-90) with a DEBUG qps counter
(main.cpp:92-98) and per-stage µs timers (table.cpp:594-603); these
operators are the distributed re-expression of that serving-telemetry
surface: what you aggregate when the query log is a table (or a stream)
instead of one terminal.

Scale shape:
* ``sessionize`` — one shuffle keyed by user_id (the window partition
  key), then pure window algebra: lag → gap flag → running sum = session
  index. Sessions never cross users, so partitions are independent; a
  skewed power-user is bounded by their own event count, not the corpus.
* ``windowed_stats`` — one hash aggregation keyed by (window, type):
  map-side partial aggregation collapses each partition to ~(windows ×
  types) rows before the shuffle, so shuffle volume is bounded by key
  cardinality, not event count. The identical plan runs under Structured
  Streaming as ``events.withWatermark("ts", ...)`` + the same
  ``F.window`` group — the batch oracle checks the aggregation semantics.

Everything is built-in column algebra (whole-stage codegen, no Python);
each op has a value-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Inactivity-gap sessionization: a new session starts when a user's
    gap since their previous event exceeds *gap_minutes*.

    Returns (user_id, session_id, session_start, session_end, n_events,
    total_value) with session_id numbering a user's sessions from 1 in
    time order (deterministic: ties on ts broken by event_id)."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # exact integer microseconds — float seconds would make the gap
    # threshold comparison epsilon-dependent between engines. The cast
    # accepts TIMESTAMP_NTZ sources (parquet isAdjustedToUTC=false) —
    # the session timezone is pinned to UTC, so NTZ->LTZ is the identity.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    sess = df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def sessionize_native(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """``sessionize`` re-expressed on the BUILT-IN ``F.session_window``
    (Spark's native merging session window): one groupBy, no window
    functions — and the identical expression runs under Structured
    Streaming with ``withWatermark`` (state merged by the engine, no
    Python state kernel). ``session_id`` (1..k per user, time order) is
    recovered by ranking session starts — a per-user window over the
    already-aggregated session rows, thousands of times smaller than the
    event table, so the second shuffle is on session cardinality.

    Semantics match ``sessionize`` exactly, including the boundary: an
    event landing EXACTLY ``gap_minutes`` after its predecessor merges
    into the session (empirically pinned in test_events — Spark merges
    windows whose ranges touch), i.e. only ``gap > threshold`` splits,
    same as the lag-based rule, so both share one oracle shape."""
    sw = F.session_window(F.col("ts").cast("timestamp"), f"{gap_minutes} minutes")
    g = (
        df.groupBy("user_id", sw.alias("sw"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )
    w = Window.partitionBy("user_id").orderBy(F.col("session_start").asc())
    return g.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("session_id"),
        "session_start",
        "session_end",
        "n_events",
        "total_value",
    )


def windowed_stats(df: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window aggregation per event_type: event count, value sum,
    exact distinct users, and the mean of the JSON property ``$.k``
    (the reference dumps features as JSON via jsonxx,
    feature_mgr.cpp:21-35 — here JSON is parsed on the way IN too).

    Batch form of the streaming plan ``withWatermark("ts", ...)
    .groupBy(F.window("ts", window), "event_type")``."""
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(
                F.avg(F.get_json_object("props", "$.k").cast("double")), 6
            ).alias("avg_k"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
            "avg_k",
        )
    )


def value_percentiles(
    df: DataFrame,
    percentiles: tuple[int, ...] = (50, 90, 99),
    value_col: str = "value",
    group_col: str = "event_type",
    approx: bool = False,
) -> DataFrame:
    """Per-group value percentiles, long form (group, p, value_at_p).

    Exact mode (default; the oracle-checked baseline) selects the value
    at rank ``ceil(p·n/100)`` — pure INTEGER position arithmetic over a
    per-group sort, and the emitted value is an untouched input double,
    so there is no float computation to drift between engines. Ties in
    the sort order are irrelevant: any ordering of equal values puts the
    same VALUE at a given rank. The per-group sort is one reducer per
    group (inherent to exact percentiles), so exact mode is for
    oracle/debug scale.

    ``approx=True`` is the 100 TB path: ``percentile_approx`` is a
    mergeable sketch — map-side partials, shuffle bounded by group
    cardinality, bounded memory regardless of group size. Its error
    bound vs exact is pinned in tests/test_events.py."""
    ps = F.array(*[F.lit(int(p)) for p in percentiles])
    if approx:
        return (
            df.groupBy(group_col)
            .agg(
                F.percentile_approx(
                    value_col, [p / 100.0 for p in percentiles], 10_000
                ).alias("vals")
            )
            .select(
                group_col,
                F.explode(F.arrays_zip(ps.alias("p"), F.col("vals").alias("value_at_p"))).alias("z"),
            )
            .select(group_col, F.col("z.p").alias("p"), F.col("z.value_at_p").alias("value_at_p"))
        )
    w = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    ranked = df.select(group_col, value_col).select(
        group_col,
        F.col(value_col),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy(group_col)).alias("n"),
    )
    return (
        ranked.withColumn("p", F.explode(ps))
        .filter(F.col("rn") == F.expr("(p * n + 99) div 100"))
        .select(group_col, "p", F.col(value_col).alias("value_at_p"))
    )


def type_hour_rollup(df: DataFrame) -> DataFrame:
    """Multi-level aggregate via ROLLUP(event_type, hour-of-day): per
    (type, hour) cells, per-type subtotals, and a grand total in ONE
    pass — Spark expands the grouping sets map-side, so the shuffle
    still carries one partial aggregate per (grouping-set, key), not one
    pass per level. The reference has no grouping sets (SURVEY.md §F);
    this is the Spark-native answer to its per-stage counter logging
    (/root/reference/src/table.cpp:594-603) generalized to a lattice.

    NULL marks the rolled-up dimension (standard SQL semantics);
    ``level`` = GROUPING__ID distinguishes a real NULL key from a
    rollup row."""
    hod = F.hour(F.col("ts").cast("timestamp")).alias("hod")
    return (
        df.select(F.col("event_type"), hod, F.col("value"))
        .rollup("event_type", "hod")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.grouping_id().alias("level"),
        )
    )
