"""Event analytics ops: behavioral pins on crafted inputs (DuckDB-oracle
equivalence runs in scripts/check_oracles.py + the driver)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from tiny_search_engine_spark.pipeline import events as ev


@pytest.fixture(scope="module")
def elog(spark):
    rows = [
        # user 1: two sessions (gap 31 min between event 2 and 3)
        (0, datetime(2024, 1, 1, 10, 0, 0), 1, "view", 1.0, '{"k": 10}'),
        (1, datetime(2024, 1, 1, 10, 10, 0), 1, "click", 2.0, '{"k": 20}'),
        (2, datetime(2024, 1, 1, 10, 41, 0), 1, "view", 3.0, '{"k": 30}'),
        # user 2: one session, exactly-30-min gap does NOT split
        (3, datetime(2024, 1, 1, 11, 0, 0), 2, "view", 4.0, '{"k": 40}'),
        (4, datetime(2024, 1, 1, 11, 30, 0), 2, "error", 5.0, '{"k": 50}'),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_sessionize_gap_split(elog):
    out = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["total_value"])
        for r in ev.sessionize(elog, gap_minutes=30).collect()
    }
    assert out == {
        (1, 1): (2, 3.0),  # events 0,1
        (1, 2): (1, 3.0),  # event 2 after a 31-min gap
        (2, 1): (2, 9.0),  # 30-min gap is not > 30 min
    }


def test_sessionize_bounds(elog):
    r = [
        x
        for x in ev.sessionize(elog, gap_minutes=30).collect()
        if x["user_id"] == 1 and x["session_id"] == 1
    ][0]
    assert r["session_start"] == datetime(2024, 1, 1, 10, 0, 0)
    assert r["session_end"] == datetime(2024, 1, 1, 10, 10, 0)


def test_windowed_stats(elog):
    out = {
        (r["window_start"].hour, r["event_type"]): (
            r["n_events"],
            r["sum_value"],
            r["n_users"],
            r["avg_k"],
        )
        for r in ev.windowed_stats(elog, "1 hour").collect()
    }
    assert out[(10, "view")] == (2, 4.0, 1, 20.0)  # events 0,2: k=10,30
    assert out[(10, "click")] == (1, 2.0, 1, 20.0)
    assert out[(11, "view")] == (1, 4.0, 1, 40.0)
    assert out[(11, "error")] == (1, 5.0, 1, 50.0)


def test_windowed_stats_codegen_plan(elog):
    """The op must stay JVM-side: no Python UDFs in the plan."""
    plan = (
        ev.windowed_stats(elog)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_windowed_stream_matches_batch(spark, tmp_path):
    """Watermarked streaming window agg: after the watermark passes a
    window's end (advanced by a later epoch), the finalized rows equal
    the batch operator's for those windows; open windows are withheld."""
    import os
    from datetime import datetime

    from tiny_search_engine_spark.streaming import windowed_stats_stream

    src = str(tmp_path / "evsrc")
    out = str(tmp_path / "evout")
    ckpt = str(tmp_path / "evckpt")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    early = [
        (0, datetime(2024, 1, 1, 0, 5), 1, "view", 1.0, '{"k": 1}'),
        (1, datetime(2024, 1, 1, 0, 50), 2, "view", 2.0, '{"k": 3}'),
        (2, datetime(2024, 1, 1, 1, 10), 1, "click", 3.0, '{"k": 5}'),
    ]
    spark.createDataFrame(early, schema).write.parquet(os.path.join(src, "e0"))
    windowed_stats_stream(spark, src, out, ckpt, window="1 hour", watermark="30 minutes")

    # late event INSIDE allowed lateness for hour-1, plus a sentinel that
    # pushes the watermark past hour 1 (ts 3:00 - 30min = 2:30 > 2:00)
    late = [
        (3, datetime(2024, 1, 1, 1, 20), 3, "click", 4.0, '{"k": 7}'),
        (4, datetime(2024, 1, 1, 3, 0), 9, "view", 0.0, '{"k": 0}'),
    ]
    spark.createDataFrame(late, schema).write.parquet(os.path.join(src, "e1"))
    windowed_stats_stream(spark, src, out, ckpt, window="1 hour", watermark="30 minutes")

    # append mode emits a window in the micro-batch AFTER the watermark
    # passes its end, so a third epoch triggers the flush of hours 0-1
    sentinel2 = [(5, datetime(2024, 1, 1, 5, 0), 9, "view", 0.0, '{"k": 0}')]
    spark.createDataFrame(sentinel2, schema).write.parquet(os.path.join(src, "e2"))
    windowed_stats_stream(spark, src, out, ckpt, window="1 hour", watermark="30 minutes")

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"], r["avg_k"])
        for r in spark.read.parquet(out).collect()
    }
    # hours 0, 1, 3 finalized (the 5:00 sentinel advanced the watermark to
    # 4:30 and availableNow runs a final flush batch); hour 5 still open
    assert got == {
        (datetime(2024, 1, 1, 0, 0), "view"): (2, 3.0, 2.0),
        (datetime(2024, 1, 1, 1, 0), "click"): (2, 7.0, 6.0),  # late event merged
        (datetime(2024, 1, 1, 3, 0), "view"): (1, 0.0, 0.0),
    }


def test_sessionize_native_matches_and_boundary(elog):
    """F.session_window twin: sessions identical to the lag-based
    operator INCLUDING the exact-gap boundary (Spark merges session
    windows whose ranges touch, so only gap > threshold splits)."""
    native = {
        (r["user_id"], r["session_id"]): (
            r["session_start"], r["session_end"], r["n_events"], r["total_value"]
        )
        for r in ev.sessionize_native(elog, gap_minutes=30).collect()
    }
    lag = {
        (r["user_id"], r["session_id"]): (
            r["session_start"], r["session_end"], r["n_events"], r["total_value"]
        )
        for r in ev.sessionize(elog, gap_minutes=30).collect()
    }
    assert native == lag
    # the exact-30-min gap merged (boundary pin: only gap > threshold splits)
    assert native[(2, 1)][2] == 2 and (2, 2) not in native


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Stateful streaming sessionization (applyInPandasWithState +
    event-time timeout) over in-order epochs equals the batch window-
    algebra operator on the same events: sessions closed by an
    intra-batch gap AND sessions flushed by the watermark timeout."""
    import os
    from datetime import datetime

    from tiny_search_engine_spark.streaming import sessionize_stream

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    # user 1: sessions (0:00-0:10), (1:00-1:05), (3:00); user 2: (0:20), (2:00)
    real = [
        (0, datetime(2024, 1, 1, 0, 0), 1, "view", 1.0, "{}"),
        (1, datetime(2024, 1, 1, 0, 10), 1, "click", 2.0, "{}"),
        (2, datetime(2024, 1, 1, 0, 20), 2, "view", 4.0, "{}"),
        (3, datetime(2024, 1, 1, 1, 0), 1, "view", 8.0, "{}"),
        (4, datetime(2024, 1, 1, 1, 5), 1, "view", 16.0, "{}"),
        (5, datetime(2024, 1, 1, 2, 0), 2, "click", 32.0, "{}"),
        (6, datetime(2024, 1, 1, 3, 0), 1, "view", 64.0, "{}"),
    ]
    epochs = [
        [r for r in real if r[1] < datetime(2024, 1, 1, 1)],
        [r for r in real if r[1] >= datetime(2024, 1, 1, 1)],
        # sentinels: advance the watermark far past every deadline; the
        # second drain run fires the timeouts even if the engine skips
        # the no-data flush batch after the first
        [(7, datetime(2024, 1, 1, 10, 0), 9, "view", 0.0, "{}")],
        [(8, datetime(2024, 1, 1, 11, 0), 9, "view", 0.0, "{}")],
    ]
    src, out, ckpt = (str(tmp_path / d) for d in ("ssrc", "sout", "sckpt"))
    for i, rows in enumerate(epochs):
        # one file per epoch: with maxFilesPerTrigger=1 each parquet PART
        # file becomes its own micro-batch, and multi-part epochs would
        # arrive in arbitrary event-time order (the kernel requires
        # epoch-order per user, as log shippers provide)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(src, f"e{i}")
        )
        sessionize_stream(
            spark, src, out, ckpt, gap_minutes=30, watermark="1 hour"
        )

    got = {
        (r["user_id"], r["session_id"]): (
            r["session_start"], r["session_end"], r["n_events"], r["total_value"]
        )
        for r in spark.read.parquet(out).collect()
        if r["user_id"] != 9
    }
    want = {
        (r["user_id"], r["session_id"]): (
            r["session_start"], r["session_end"], r["n_events"], r["total_value"]
        )
        for r in ev.sessionize(
            spark.createDataFrame(real, schema), gap_minutes=30
        ).collect()
    }
    assert got == want
    assert len(got) == 5  # 3 sessions for user 1, 2 for user 2


def test_type_hour_rollup_levels(elog):
    rows = ev.type_hour_rollup(elog).collect()
    # grand total: level 3, all keys null
    gt = [r for r in rows if r["level"] == 3]
    assert len(gt) == 1 and gt[0]["n_events"] == 5 and gt[0]["sum_value"] == 15.0
    # per-type subtotals: level 1 (hod rolled up)
    sub = {r["event_type"]: r["n_events"] for r in rows if r["level"] == 1}
    assert sub == {"view": 3, "click": 1, "error": 1}
    # leaf cells: level 0
    leaf = {(r["event_type"], r["hod"]): r["n_events"] for r in rows if r["level"] == 0}
    assert leaf[("view", 10)] == 2 and leaf[("view", 11)] == 1


def test_value_percentiles_exact(spark):
    """Exact rank-position percentiles match the pure-python definition
    value[ceil(p*n/100)] on a crafted multiset (incl. duplicate values)."""
    import math

    vals = [5.0, 1.0, 3.0, 3.0, 2.0, 9.0, 7.0]  # n=7, with ties
    rows = [(i, datetime(2024, 1, 1, 0, 0, i), 1, "t", v, "{}") for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r["p"]: r["value_at_p"] for r in ev.value_percentiles(df, (50, 90, 99)).collect()}
    s = sorted(vals)
    want = {p: s[math.ceil(p * len(s) / 100) - 1] for p in (50, 90, 99)}
    assert got == want


def test_value_percentiles_approx_close_to_exact(spark):
    """The percentile_approx sketch (the mergeable 100 TB path) lands
    within one value-step of the exact rank-position baseline."""
    import random

    rng = random.Random(7)
    rows = [
        (i, datetime(2024, 1, 1, 0, 0, 0), 1, ["a", "b"][i % 2], rng.uniform(0, 100), "{}")
        for i in range(2000)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    exact = {(r["event_type"], r["p"]): r["value_at_p"]
             for r in ev.value_percentiles(df, (50, 90, 99)).collect()}
    approx = {(r["event_type"], r["p"]): r["value_at_p"]
              for r in ev.value_percentiles(df, (50, 90, 99), approx=True).collect()}
    assert set(exact) == set(approx)
    for k, v in exact.items():
        assert abs(approx[k] - v) < 0.5  # 1000 uniform(0,100) samples/type


def test_asof_join_brute(spark):
    """Backward as-of vs a pure-Python brute force over a crafted log:
    inclusive boundary, equal-ts tie to highest order_col, cross-user
    isolation, unmatched-left NULLs, tolerance cutoff."""
    from datetime import datetime as dt

    L = [  # (event_id, ts, user_id)
        (0, dt(2024, 1, 1, 10, 0, 0), 1),
        (1, dt(2024, 1, 1, 10, 30, 0), 1),
        (2, dt(2024, 1, 1, 9, 0, 0), 1),   # before every right row
        (3, dt(2024, 1, 1, 10, 0, 0), 2),  # other user
        (4, dt(2024, 1, 1, 12, 0, 0), 1),
    ]
    R = [  # (event_id, ts, user_id, value)
        (100, dt(2024, 1, 1, 10, 0, 0), 1, 1.0),   # ties L0 exactly
        (101, dt(2024, 1, 1, 10, 0, 0), 1, 2.0),   # same ts, higher id wins
        (102, dt(2024, 1, 1, 10, 20, 0), 1, 3.0),
        (103, dt(2024, 1, 1, 9, 30, 0), 2, 4.0),
    ]
    left = spark.createDataFrame(L, "event_id long, ts timestamp, user_id long")
    right = spark.createDataFrame(
        R, "event_id long, ts timestamp, user_id long, value double"
    )

    def brute(tol_min=None):
        out = {}
        for lid, lts, lu in L:
            cands = [
                r for r in R
                if r[2] == lu and r[1] <= lts
                and (tol_min is None or (lts - r[1]).total_seconds() <= tol_min * 60)
            ]
            best = max(cands, key=lambda r: (r[1], r[0])) if cands else None
            out[lid] = (best[0], best[3]) if best else (None, None)
        return out

    got = {
        r["event_id"]: (r["r_event_id"], r["r_value"])
        for r in ev.asof_join(left, right).collect()
    }
    assert got == brute()
    assert got[0] == (101, 2.0)  # inclusive boundary + tie to highest id
    assert got[2] == (None, None)  # nothing prior -> NULL payload, row kept
    # tolerance: L4 is 100 min after R102 -> cut at 60-min tolerance
    got_tol = {
        r["event_id"]: (r["r_event_id"], r["r_value"])
        for r in ev.asof_join(left, right, tolerance_minutes=60).collect()
    }
    assert got_tol == brute(60)
    assert got_tol[4] == (None, None)
    # row count preserved (left outer semantics)
    assert ev.asof_join(left, right).count() == len(L)


def test_asof_join_partitioning_invariant(spark):
    from datetime import datetime as dt, timedelta

    rows = [
        (i, dt(2024, 1, 1) + timedelta(minutes=7 * i), i % 3)
        for i in range(60)
    ]
    left = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    right = spark.createDataFrame(
        [(i + 1000, ts, u, float(i)) for i, ts, u in rows[::2]],
        "event_id long, ts timestamp, user_id long, value double",
    )
    a = sorted(
        (r["event_id"], r["r_event_id"]) for r in ev.asof_join(left, right).collect()
    )
    b = sorted(
        (r["event_id"], r["r_event_id"])
        for r in ev.asof_join(left.repartition(13), right.repartition(2)).collect()
    )
    assert a == b


def test_range_join_brute_and_bins(spark):
    """Binned interval join vs brute containment; intervals spanning
    multiple bins; inclusive endpoints; keyed isolation; max_bins guard."""
    from datetime import datetime as dt

    P = [  # (event_id, ts, user_id)
        (0, dt(2024, 1, 1, 10, 0, 0), 1),
        (1, dt(2024, 1, 1, 13, 30, 0), 1),   # interval spans several 1h bins
        (2, dt(2024, 1, 1, 15, 0, 0), 1),    # exactly at an interval end
        (3, dt(2024, 1, 1, 16, 0, 1), 1),    # one second outside
        (4, dt(2024, 1, 1, 10, 30, 0), 2),   # other user, same times
    ]
    I = [  # (interval_id, start, end, user_id)
        (10, dt(2024, 1, 1, 10, 0, 0), dt(2024, 1, 1, 11, 0, 0), 1),
        (11, dt(2024, 1, 1, 12, 0, 0), dt(2024, 1, 1, 15, 0, 0), 1),
        (12, dt(2024, 1, 1, 10, 0, 0), dt(2024, 1, 1, 11, 0, 0), 2),
    ]
    pts = spark.createDataFrame(P, "event_id long, ts timestamp, user_id long")
    ivl = spark.createDataFrame(
        I, "interval_id long, session_start timestamp, session_end timestamp, user_id long"
    )
    got = sorted(
        (r["event_id"], r["interval_id"])
        for r in ev.range_join(pts, ivl, bin_minutes=60).collect()
    )
    brute = sorted(
        (pid, iid)
        for pid, pts_, pu in P
        for iid, s, e, iu in I
        if pu == iu and s <= pts_ <= e
    )
    assert got == brute
    assert (2, 11) in got and (3, 11) not in got  # inclusive end, outside drops
    assert (0, 10) in got and (4, 12) in got and (0, 12) not in got
    # max_bins guard raises instead of exploding
    import pytest as _pt
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with _pt.raises((Py4JJavaError, SparkRuntimeException, Exception), match="max_bins"):
        ev.range_join(pts, ivl, bin_minutes=1, max_bins=10).collect()


def test_range_join_reproduces_sessionization(elog):
    """Every event lands in exactly the session whose interval contains
    it — range_join(events, sessionize(events)) is a self-oracle."""
    sess = ev.sessionize(elog, gap_minutes=30)
    out = ev.range_join(elog, sess, bin_minutes=30)
    assert out.count() == elog.count()
    # event 2 (the post-gap singleton) maps to user 1 session 2
    row = [r for r in out.collect() if r["event_id"] == 2][0]
    assert (row["user_id"], row["session_id"]) == (1, 2)


def test_funnel_brute(spark):
    """Funnel vs pure-python brute: strictly-after chaining, horizon from
    step 1, NULL propagation after a break, only step-1 completers kept."""
    from datetime import datetime as dt, timedelta

    base = dt(2024, 1, 1)
    rows, eid = [], 0

    def add(u, minutes, typ):
        nonlocal eid
        rows.append((eid, base + timedelta(minutes=minutes), u, typ, 1.0, "{}"))
        eid += 1

    add(1, 0, "signup"); add(1, 10, "view"); add(1, 20, "purchase")   # full
    add(2, 0, "view"); add(2, 10, "signup"); add(2, 5, "purchase")    # view/purchase BEFORE signup
    add(2, 30, "view")                                                 # completes step 2 only
    add(3, 0, "signup")                                                # step 1 only
    add(4, 0, "view"); add(4, 10, "purchase")                          # never signs up -> absent
    add(5, 0, "signup"); add(5, 0, "view")                             # same ts: NOT strictly after
    add(6, 0, "signup"); add(6, 2000, "view"); add(6, 2010, "purchase")  # view outside 24h horizon
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    steps = ("signup", "view", "purchase")

    def brute(horizon_min):
        out = {}
        by_u = {}
        for _, ts, u, typ, _, _ in rows:
            by_u.setdefault(u, []).append((ts, typ))
        for u, evs in by_u.items():
            firsts = [min((t for t, y in evs if y == steps[0]), default=None)]
            if firsts[0] is None:
                continue
            for s in steps[1:]:
                prev = firsts[-1]
                cand = [
                    t for t, y in evs
                    if y == s and prev is not None and t > prev
                    and (t - firsts[0]).total_seconds() <= horizon_min * 60
                ]
                firsts.append(min(cand, default=None))
            out[u] = tuple(
                int(t.timestamp() * 1_000_000) if t else None for t in firsts
            ) + (sum(1 for t in firsts if t),)
        return out

    got = {
        r["user_id"]: (r["t1_us"], r["t2_us"], r["t3_us"], r["steps_completed"])
        for r in ev.funnel(df, steps=steps, horizon_minutes=24 * 60).collect()
    }
    assert got == brute(24 * 60)
    assert 4 not in got                       # no step 1, no row
    assert got[5][1] is None                  # same-ts is not strictly after
    assert got[6][3] == 1                     # horizon cuts step 2 (and 3)
    assert got[2][3] == 2 and got[2][2] is None  # purchase-before-view breaks chain


def test_funnel_no_horizon_and_single_step(spark):
    from datetime import datetime as dt

    df = spark.createDataFrame(
        [(0, dt(2024, 1, 1), 1, "signup", 1.0, "{}"),
         (1, dt(2024, 3, 1), 1, "view", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = ev.funnel(df, steps=("signup", "view")).collect()[0]
    assert r["steps_completed"] == 2  # no horizon: 2 months later still counts
    r1 = ev.funnel(df, steps=("signup",)).collect()[0]
    assert r1["steps_completed"] == 1
    import pytest as _pt
    with _pt.raises(ValueError, match="at least one step"):
        ev.funnel(df, steps=())


def test_asof_join_null_key_and_null_ts(spark):
    """SQL equi-join semantics: NULL-key or NULL-ts right rows match
    nothing; NULL-key left rows are kept with NULL payloads."""
    from datetime import datetime as dt

    left = spark.createDataFrame(
        [(0, dt(2024, 1, 1, 10, 0), 1), (1, dt(2024, 1, 1, 10, 0), None)],
        "event_id long, ts timestamp, user_id long",
    )
    right = spark.createDataFrame(
        [(100, None, 1, 7.0), (101, dt(2024, 1, 1, 9, 0), None, 8.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    got = {r["event_id"]: (r["r_event_id"], r["r_value"])
           for r in ev.asof_join(left, right).collect()}
    # NULL-ts right row (user 1) and NULL-key right row both match nothing
    assert got == {0: (None, None), 1: (None, None)}


def test_range_join_guards(spark):
    from datetime import datetime as dt

    pts = spark.createDataFrame(
        [(0, dt(2024, 1, 1, 10, 0), 1)], "event_id long, ts timestamp, user_id long"
    )
    ivl = spark.createDataFrame(
        [(10, dt(2024, 1, 1, 0, 30), dt(2024, 1, 1, 10, 30), 1)],
        "interval_id long, session_start timestamp, session_end timestamp, user_id long",
    )
    # shared non-key column name -> loud ValueError, not AMBIGUOUS_REFERENCE
    import pytest as _pt
    with _pt.raises(ValueError, match="share non-key columns"):
        ev.range_join(pts, ivl.withColumnRenamed("interval_id", "event_id"))
    # exploded-bin count guard: 00:30-10:30 straddles 11 one-hour bins
    with _pt.raises(Exception, match="max_bins"):
        ev.range_join(pts, ivl, bin_minutes=60, max_bins=10).collect()
    assert ev.range_join(pts, ivl, bin_minutes=60, max_bins=11).count() == 1


def test_range_join_null_bounds_dropped(spark):
    """A NULL start/end interval matches nothing (theta-join oracle
    semantics) instead of tripping the max_bins raise_error guard — one
    dirty row must not crash the job."""
    from datetime import datetime as dt

    pts = spark.createDataFrame(
        [(0, dt(2024, 1, 1, 10, 0), 1)], "event_id long, ts timestamp, user_id long"
    )
    ivl = spark.createDataFrame(
        [
            (10, dt(2024, 1, 1, 9, 30), dt(2024, 1, 1, 10, 30), 1),
            (11, None, dt(2024, 1, 1, 10, 30), 1),
            (12, dt(2024, 1, 1, 9, 30), None, 1),
            (13, None, None, 1),
        ],
        "interval_id long, session_start timestamp, session_end timestamp, user_id long",
    )
    rows = ev.range_join(pts, ivl, bin_minutes=60, max_bins=100).collect()
    assert [r["interval_id"] for r in rows] == [10]


def test_transition_counts_brute(spark):
    rows = [
        (0, datetime(2024, 1, 1, 10, 0), 1, "view", 0.0, "{}"),
        (1, datetime(2024, 1, 1, 10, 1), 1, "click", 0.0, "{}"),
        (2, datetime(2024, 1, 1, 10, 2), 1, "view", 0.0, "{}"),
        # user 2: ts tie broken by event_id
        (3, datetime(2024, 1, 1, 11, 0), 2, "view", 0.0, "{}"),
        (4, datetime(2024, 1, 1, 11, 0), 2, "buy", 0.0, "{}"),
        # user 3: single event -> only a (start) transition
        (5, datetime(2024, 1, 1, 12, 0), 3, "view", 0.0, "{}"),
        # NULL user dropped
        (6, datetime(2024, 1, 1, 12, 0), None, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {
        (r["prev_type"], r["event_type"]): (r["n_trans"], r["prob"])
        for r in ev.transition_counts(df).collect()
    }
    assert got == {
        ("(start)", "view"): (3, 1.0),
        ("view", "click"): (1, 0.5),
        ("view", "buy"): (1, 0.5),
        ("click", "view"): (1, 1.0),
    }
    # min_count prunes the LISTING only — totals (and so probs) are over
    # ALL transitions, keeping prob a true Markov probability
    got2 = ev.transition_counts(df, min_count=2).collect()
    assert [(r["prev_type"], r["n_trans"], r["prob"]) for r in got2] == [("(start)", 3, 1.0)]


def _brute_bursts(counts, trailing, min_history, z_thr):
    """counts: ordered [(ws, n)] for ONE type -> [(ws, n, n_prior, mean, z, burst)]"""
    import math

    out = []
    for i, (ws, cnt) in enumerate(counts):
        prior = [c for _, c in counts[max(0, i - trailing) : i]]
        n = len(prior)
        if n == 0:
            out.append((ws, cnt, 0, None, None, False))
            continue
        s, ss = sum(prior), sum(c * c for c in prior)
        mean = s / n
        var = (float(ss) - float(s) * s / n) / (n - 1) if n > 1 else None
        z = None
        if n >= min_history and var is not None and var > 0:
            z = round((cnt - mean) / math.sqrt(var), 6)
        out.append((ws, cnt, n, round(mean, 6), z, bool(z is not None and z >= z_thr)))
    return out


def test_burst_windows_brute(spark):
    # type A: 8 calm hours then a spike; type B: too little history
    rows = []
    eid = 0
    calm = [5, 6, 5, 7, 6, 5, 6, 5]
    for h, c in enumerate(calm + [40]):
        for j in range(c):
            rows.append((eid, datetime(2024, 1, 1, h, j % 60), 1, "A", 0.0, "{}"))
            eid += 1
    for h in range(3):
        rows.append((eid, datetime(2024, 1, 1, h, 0), 2, "B", 0.0, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {
        (r["event_type"], r["window_start"]): r
        for r in ev.burst_windows(df, "1 hour", trailing=24, min_history=6, z_threshold=3.0).collect()
    }
    base = int(datetime(2024, 1, 1).timestamp()) * 1_000_000
    exp_counts = [(base + h * 3_600_000_000, c) for h, c in enumerate(calm + [40])]
    for ws, cnt, n_prior, mean, z, burst in _brute_bursts(exp_counts, 24, 6, 3.0):
        r = got[("A", ws)]
        assert (r["n_events"], r["n_prior"]) == (cnt, n_prior), ws
        assert r["mean_prior"] == pytest.approx(mean) if mean is not None else r["mean_prior"] is None
        if z is None:
            assert r["z_score"] is None
        else:
            assert r["z_score"] == pytest.approx(z, abs=1e-6)
        assert r["is_burst"] == burst
    # the spike IS flagged; nothing else is
    bursts = [(t, ws) for (t, ws), r in got.items() if r["is_burst"]]
    assert bursts == [("A", exp_counts[-1][0])]
    # type B never has enough history
    assert all(r["z_score"] is None for (t, _), r in got.items() if t == "B")


def test_cohort_retention_brute(spark):
    # weeks: 2024-01-01, 01-08, 01-15 (Mondays)
    rows = [
        # u1: cohort w0, active w0, w1, w2
        (0, datetime(2024, 1, 2), 1, "view", 0.0, "{}"),
        (1, datetime(2024, 1, 9), 1, "view", 0.0, "{}"),
        (2, datetime(2024, 1, 16), 1, "view", 0.0, "{}"),
        # u2: cohort w0, active w0 only (two events same week count once)
        (3, datetime(2024, 1, 3), 2, "view", 0.0, "{}"),
        (4, datetime(2024, 1, 5), 2, "view", 0.0, "{}"),
        # u3: cohort w1, active w1, w2
        (5, datetime(2024, 1, 10), 3, "view", 0.0, "{}"),
        (6, datetime(2024, 1, 17), 3, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {
        (r["cohort_period"], r["period_offset"]): (r["n_active"], r["cohort_size"], r["retention"])
        for r in ev.cohort_retention(df, "week").collect()
    }
    w0 = int(datetime(2024, 1, 1).timestamp())
    w1 = w0 + 7 * 86400
    assert got == {
        (w0, 0): (2, 2, 1.0),
        (w0, 1): (1, 2, 0.5),
        (w0, 2): (1, 2, 0.5),
        (w1, 0): (1, 1, 1.0),
        (w1, 1): (1, 1, 1.0),
    }
    with pytest.raises(ValueError):
        ev.cohort_retention(df, "month")


def test_transition_counts_min_count_keeps_true_probs(spark):
    rows = []
    eid = 0
    for i in range(3):  # three users: view -> click
        rows += [(eid, datetime(2024, 1, 1, 10, 0), 10 + i, "view", 0.0, "{}"),
                 (eid + 1, datetime(2024, 1, 1, 10, 1), 10 + i, "click", 0.0, "{}")]
        eid += 2
    rows += [(eid, datetime(2024, 1, 1, 10, 0), 99, "view", 0.0, "{}"),
             (eid + 1, datetime(2024, 1, 1, 10, 1), 99, "buy", 0.0, "{}")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {
        (r["prev_type"], r["event_type"]): r["prob"]
        for r in ev.transition_counts(df, min_count=2).collect()
    }
    # buy row (n=1) pruned from the LISTING, but click's prob is still
    # normalized over all 4 'view' transitions: 3/4, not 3/3
    assert ("view", "buy") not in got
    assert got[("view", "click")] == 0.75
