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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = ("event_id", "value"),
    order_col: str = "event_id",
    tolerance_minutes: int | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join: each *left* row picks the single most recent
    *right* row of the same key with ``right.ts <= left.ts`` (inclusive —
    a right row at exactly left's timestamp matches), optionally within
    ``tolerance_minutes``; unmatched left rows keep NULL payloads (left
    outer semantics). Ties among right rows at the same timestamp break
    to the HIGHEST ``order_col`` — deterministic on both engines. This is
    the time-series point-lookup join Spark's optimizer has no native
    operator for (pandas has merge_asof; the reference engine has no
    temporal joins at all — its only join is the posting OR-merge,
    /root/reference/src/table.cpp recall loop).

    Implementation is the union + forward-fill trick, NOT a range join:
    both sides union into one stream tagged so right rows sort before
    left rows at equal timestamps, one window per key forward-fills the
    last-seen right payload (``F.last(ignorenulls=True)``), and left rows
    read it off. Scale shape: ONE shuffle keyed on ``key_col`` (no
    per-pair candidate generation, so a right row matching millions of
    left rows costs nothing extra); a skewed key is bounded by its own
    combined event count exactly like ``sessionize``. The tolerance is a
    post-pick filter — the newest prior row is the only possible match,
    so nulling it when too old equals filtering the join. All column
    algebra; oracle ``event_asof`` replays it with an ANSI window in
    DuckDB."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    pay = F.struct(
        us.alias("_rts_us"),
        F.col(ts_col).cast("timestamp").alias("_rts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    # SQL equi-join semantics: a NULL-key or NULL-ts right row matches
    # nothing (the window would otherwise group NULL keys together and
    # sort NULL ts first, forward-filling phantom matches); NULL-key/ts
    # LEFT rows need no filter — their window slice holds no right rows,
    # so they keep NULL payloads, same as a left outer join
    right = right.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
    r = right.select(
        F.col(key_col),
        us.alias("_us"),
        F.lit(0).alias("_side"),
        F.col(order_col).alias("_ord"),
        pay.alias("_rpay"),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        F.col(key_col),
        us.alias("_us"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_ord"].dataType).alias("_ord"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    # right rows sort before left at equal ts (inclusive match); among
    # equal-ts right rows the highest order_col lands nearest the left
    # row, so last(ignorenulls) picks it
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("_us").asc(), F.col("_side").asc(), F.col("_ord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r.unionByName(l).withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
    m = F.col("_m")
    if tolerance_minutes is not None:
        m = F.when(
            F.col("_us") - F.col("_m._rts_us") <= tolerance_minutes * 60 * 1_000_000,
            F.col("_m"),
        )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        m["_rts"].alias(f"{prefix}{ts_col}"),
        *[m[c].alias(f"{prefix}{c}") for c in right_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "ts",
    start_col: str = "session_start",
    end_col: str = "session_end",
    key_col: str | None = "user_id",
    bin_minutes: int = 60,
    max_bins: int = 10_000,
) -> DataFrame:
    """Interval-containment join: each point row pairs with every interval
    row satisfying ``start <= point <= end`` (both ends inclusive) and, if
    ``key_col`` is given, the same key — WITHOUT the cross product a naive
    theta join plans (Spark turns a pure range predicate into
    BroadcastNestedLoopJoin: O(points × intervals)).

    The bucketing trick: time is cut into fixed ``bin_minutes`` bins; each
    interval explodes to the bin ids it spans, each point maps to its one
    bin, and the match becomes an EQUI-join on (key, bin) + the exact
    containment filter. A (point, interval) match shares exactly one bin —
    the point's — so no post-join dedup is needed. Shuffle volume is
    points + Σ interval-spans rows, never the pair count; a hot bin is a
    skew key AQE can split, not a plan explosion. ``max_bins`` refuses
    degenerate intervals that would explode the build side (an interval
    spanning > max_bins bins means the bin width is wrong for the data —
    raise, don't silently build a bomb). Columns: all point columns + all
    interval columns (inner join; points outside every interval drop).
    Oracle ``event_range_join`` is the plain theta join in DuckDB."""
    shared = (set(points.columns) & set(intervals.columns)) - {key_col}
    if shared:
        raise ValueError(
            f"range_join: points and intervals share non-key columns {sorted(shared)}; "
            "rename or pre-select disjoint columns"
        )
    p_us = F.unix_micros(F.col(point_col).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    # NULL-bound intervals match nothing under the theta-join oracle's SQL
    # semantics — drop them BEFORE binning (mirrors asof_join's right-side
    # filter); without this a single NULL start/end makes the when() guard
    # condition NULL and falls into the raise_error branch, crashing the
    # job on one dirty row.  Only end<start / span>max_bins should raise.
    intervals = intervals.filter(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    )
    bin_us = bin_minutes * 60 * 1_000_000
    # the guard lives INSIDE the sequence bound so Catalyst cannot prune
    # it away as an unused column — a dead raise_error guards nothing.
    # Count EXPLODED bins (floor(e)-floor(s)+1), not duration/bin — an
    # unaligned interval straddles one more bin than its duration spans
    end_bin = F.when(
        (e_us >= s_us)
        & (F.floor(e_us / bin_us) - F.floor(s_us / bin_us) + 1 <= max_bins),
        F.floor(e_us / bin_us),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"range_join: interval spans > max_bins={max_bins} bins "
                    f"of {bin_minutes}min (or end < start); widen bin_minutes: "
                ),
                F.col(start_col).cast("string"),
                F.lit(" .. "),
                F.col(end_col).cast("string"),
            )
        )
    )
    ivl = intervals.withColumn(
        "_bin", F.explode(F.sequence(F.floor(s_us / bin_us), end_bin))
    )
    pts = points.withColumn("_bin", F.floor(p_us / bin_us))
    on = ["_bin"] if key_col is None else [key_col, "_bin"]
    joined = pts.join(ivl, on).filter(
        (p_us >= s_us) & (p_us <= e_us)
    )
    out_cols = [F.col(c) for c in points.columns] + [
        F.col(c) for c in intervals.columns if c != key_col
    ]
    return joined.select(*out_cols)


def funnel(
    df: DataFrame,
    steps: tuple[str, ...] = ("signup", "view", "purchase"),
    horizon_minutes: int | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-step funnel analysis: for each user, the earliest time each
    step was completed STRICTLY AFTER the previous step (step 1 = the
    user's earliest such event; with ``horizon_minutes``, later steps must
    also land within the horizon of step 1). Emits one row per user who
    completed step 1: (user, t1_us..tk_us as unix micros — NULL once the
    chain breaks, and a NULL step nulls everything after it) plus
    ``steps_completed``. The product-analytics "conversion funnel"
    (Amplitude/Mixpanel semantics: first qualifying event per step).

    Scale shape: one filter to the step types, then k per-user min-aggs
    each joined back against the (user-cardinality) previous frontier —
    the join is many-to-one on the user key, never event×event; every agg
    has a map-side partial, so shuffle volume per pass is bounded by user
    cardinality. k is the funnel length (tiny constant). All column
    algebra; oracle ``event_funnel`` replays the same chained-CTE shape
    in DuckDB."""
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = df.filter(F.col(type_col).isin(*steps)).select(
        F.col(user_col), F.col(type_col), us.alias("_us")
    )
    cur = (
        ev.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min("_us").alias("t1_us"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}_us"
        cand = ev.filter(F.col(type_col) == step).join(
            cur.select(user_col, F.col(prev).alias("_prev"), F.col("t1_us").alias("_t1")),
            user_col,
        )
        cond = F.col("_us") > F.col("_prev")
        if horizon_minutes is not None:
            cond = cond & (
                F.col("_us") - F.col("_t1") <= horizon_minutes * 60 * 1_000_000
            )
        nxt = (
            cand.filter(cond)
            .groupBy(user_col)
            .agg(F.min("_us").alias(f"t{i}_us"))
        )
        cur = cur.join(nxt, user_col, "left")
    done = sum(
        (F.col(f"t{i}_us").isNotNull()).cast("int") for i in range(1, len(steps) + 1)
    )
    return cur.select(
        user_col,
        *[F.col(f"t{i}_us") for i in range(1, len(steps) + 1)],
        done.cast("long").alias("steps_completed"),
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


def transition_counts(df: DataFrame, min_count: int = 1) -> DataFrame:
    """First-order Markov transition census over the event stream: how
    often does a user's ``prev_type`` event get followed by ``event_type``
    — the path-analysis primitive behind "what do users do after signup".
    Each user's first event transitions from the literal '(start)' state.

    Returns (prev_type, event_type, n_trans, prob) with prob =
    round(n_trans / Σ n_trans per prev_type, 6).

    Scale shape: ONE shuffle keyed by user_id (the lag window partition —
    same key sessionize already uses, so co-scheduled pipelines reuse the
    exchange), then two dictionary-sized aggregations (|types|² keys at
    most) with map-side partials. Ties on ts are broken by event_id, so
    the transition sequence — and the oracle — is deterministic."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    trans = (
        df.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .withColumn("prev_type", F.coalesce(F.lag("event_type").over(w), F.lit("(start)")))
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n_trans"))
    )
    # totals over ALL transitions (before the min_count prune), so prob
    # stays a true Markov probability — pruned tails just aren't listed
    totals = trans.groupBy("prev_type").agg(F.sum("n_trans").alias("_tot"))
    return (
        trans.filter(F.col("n_trans") >= min_count)
        .join(F.broadcast(totals), "prev_type")
        .withColumn("prob", F.round(F.col("n_trans") / F.col("_tot"), 6))
        .select("prev_type", "event_type", "n_trans", "prob")
    )


def burst_windows(
    df: DataFrame,
    window: str = "1 hour",
    trailing: int = 24,
    min_history: int = 6,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Burst / anomaly detection on event volume: per (event_type,
    tumbling window) counts compared against the TRAILING ``trailing``
    windows' mean and sample stddev; a window is a burst when its z-score
    ≥ ``z_threshold`` (given ≥ ``min_history`` prior windows and nonzero
    variance). The ops-telemetry layer over the same tumbling windows
    ``windowed_stats`` aggregates.

    Mean/std come from explicit integer sums over the frame
    (Σcnt, Σcnt² are exact BIGINTs; variance = (ss − s²/n)/(n−1) in
    doubles) — NOT stddev_samp — so the float path is reproducible
    bit-for-bit in the SQL oracle. Missing (zero-count) windows are not
    materialized; the frame is over OBSERVED windows per type.

    Returns (event_type, window_start µs, n_events, n_prior, mean_prior,
    z_score, is_burst).

    Scale shape: the corpus-sized pass is ONE map-side-combined count
    keyed by (type, window) — cardinality |types| × |windows|, tiny even
    at 100 TB; the trailing-frame window then runs over that dictionary-
    sized table partitioned by type."""
    cnt = (
        df.filter(F.col("ts").isNotNull())
        .groupBy("event_type", F.window("ts", window).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "event_type",
            F.unix_micros(F.col("w.start")).alias("window_start"),
            "n_events",
        )
    )
    frame = (
        Window.partitionBy("event_type")
        .orderBy(F.col("window_start").asc())
        .rowsBetween(-trailing, -1)
    )
    n = F.count("n_events").over(frame)
    s = F.sum("n_events").over(frame)
    ss = F.sum(F.col("n_events") * F.col("n_events")).over(frame)
    mean = s / n
    # all-double arithmetic past the exact integer sums: s² would overflow
    # BIGINT at ~3e9 events/window; the double path is identical (and
    # bit-reproducible) in the SQL oracle
    var = (ss.cast("double") - s.cast("double") * s / n) / (n - 1)
    z = (F.col("n_events") - mean) / F.sqrt(var)
    return (
        cnt.withColumn("n_prior", F.coalesce(n, F.lit(0)))
        .withColumn("mean_prior", F.round(mean, 6))
        .withColumn(
            "z_score",
            F.when((F.col("n_prior") >= min_history) & (var > 0), F.round(z, 6)),
        )
        .withColumn(
            "is_burst",
            F.coalesce(F.col("z_score") >= z_threshold, F.lit(False)),
        )
        .select(
            "event_type", "window_start", "n_events", "n_prior",
            "mean_prior", "z_score", "is_burst",
        )
    )


def cohort_retention(df: DataFrame, period: str = "week") -> DataFrame:
    """Cohort retention matrix: users grouped by the period of their
    FIRST event (the cohort); for each later period, what fraction of
    the cohort was active. The classic growth-analytics triangle.

    Period keys are emitted as exact epoch seconds of the
    ``date_trunc(period)`` boundary and offsets as integer period counts
    derived from epoch arithmetic — no engine-specific date diffing, so
    the DuckDB oracle matches bit-for-bit. The offset division assumes
    fixed-length periods, which holds under the UTC session timezone
    this repo pins (session.py); under a DST timezone, week boundaries
    straddling a transition are not 604800 s apart and the truncating
    cast would misassign that week's offset. Returns (cohort_period s,
    period_offset, n_active, cohort_size, retention).

    Scale shape: one user-keyed aggregation for first-seen (map-side
    combined), one distinct over (user, period) — both shuffles keyed by
    user_id — then a broadcast of the dictionary-sized cohort census;
    the output is |periods|²/2 rows regardless of corpus size."""
    secs = {"week": 7 * 86400, "day": 86400}
    if period not in secs:
        raise ValueError(f"cohort_retention: unsupported period {period!r}")
    plen = secs[period]
    ev = df.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    pcol = F.unix_seconds(F.date_trunc(period, F.col("ts")).cast("timestamp"))
    user_periods = ev.select("user_id", pcol.alias("p")).distinct()
    cohorts = user_periods.groupBy("user_id").agg(F.min("p").alias("cohort_period"))
    sizes = cohorts.groupBy("cohort_period").agg(
        F.countDistinct("user_id").alias("cohort_size")
    )
    active = (
        user_periods.join(cohorts, "user_id")
        .withColumn(
            "period_offset",
            ((F.col("p") - F.col("cohort_period")) / F.lit(plen)).cast("int"),
        )
        .groupBy("cohort_period", "period_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return (
        active.join(F.broadcast(sizes), "cohort_period")
        .withColumn("retention", F.round(F.col("n_active") / F.col("cohort_size"), 6))
        .select("cohort_period", "period_offset", "n_active", "cohort_size", "retention")
    )
