"""Stateful streaming sessionization: the Structured-Streaming twin of
``pipeline/events.sessionize`` built on ``applyInPandasWithState``.

The batch operator is window algebra (lag → gap flag → running sum); a
stream cannot window over "all of a user's events" because they never
stop arriving — the idiomatic Spark shape is per-key mutable state with
an event-time timeout:

* events are grouped by ``user_id``; each user's open session lives in
  the state store as (start_us, last_us, n_events, total_value, seq);
* an incoming batch merges into the open session; any intra-batch gap
  over ``gap_minutes`` CLOSES a session, which is emitted immediately
  (append semantics — a closed session can never change);
* the open session arms an event-time timeout at ``last_ts + gap``; when
  the watermark passes it, no on-time event can extend the session, so
  the timeout callback emits it and clears the state. This is the exact
  streaming analogue of the batch gap rule, with the watermark standing
  in for "we have seen everything up to here".

Scale shape: state is one fixed-width row per user with an OPEN session
(closed + timed-out sessions leave the store), shuffled once by user_id
— the same key the batch twin partitions by; a hot user costs their own
event count, nothing global. The Python hop is an Arrow-batched
per-group kernel over a handful of columns.

Guarantees and deviations from batch, both forced by streaming:
* session numbering (``session_id`` 1..k per user, time order) matches
  batch as long as a user's state survives; after a timeout evicts it,
  numbering restarts at 1 (consumers should key on (user_id,
  session_start) — batch parity for a fully-drained bounded input is
  pinned by the test);
* events must be on time w.r.t. the watermark: a LATE event (older than
  watermark) for an evicted session would start a new session rather
  than reopen it — the same trade every watermarked operator makes;
* micro-batches must arrive in event-time order PER USER (the order log
  shippers provide): disorder WITHIN a batch is fine (the kernel sorts),
  but an event older than the open session's end arriving in a LATER
  batch cannot retroactively re-split aggregates already merged —
  exactness under cross-batch disorder needs an event buffer keyed by
  watermark, which is what ``withWatermark`` + ``F.session_window``
  (the built-in, see ``windowed_stats``'s module) trades state size for.

The reference has no streaming at all (SURVEY.md §F); its closest
surface is the interactive query loop (/root/reference/src/main.cpp:75-90).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .event_stream import EVENT_SCHEMA

SESSION_SCHEMA = (
    "user_id long, session_id long, session_start timestamp, "
    "session_end timestamp, n_events long, total_value double"
)

# open-session carry: micros are exact integers (float seconds would make
# the gap comparison epsilon-dependent — same reasoning as the batch op)
STATE_SCHEMA = (
    "start_us long, last_us long, n_events long, total_value double, seq long"
)

_US_PER_MIN = 60 * 1_000_000

_OUT_COLS = [
    "user_id", "session_id", "session_start", "session_end", "n_events", "total_value",
]


def _emit(user_id: int, seq: int, start_us: int, last_us: int, n: int, tot: float) -> dict:
    return {
        "user_id": user_id,
        "session_id": seq,
        "session_start": pd.Timestamp(start_us, unit="us"),
        "session_end": pd.Timestamp(last_us, unit="us"),
        "n_events": n,
        "total_value": round(tot, 6),
    }


def make_session_fn(gap_minutes: int):
    """The per-user state kernel (module-level factory so the closure
    pickles cleanly to executors)."""
    gap_us = gap_minutes * _US_PER_MIN

    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        closed: list[dict] = []

        if state.hasTimedOut:
            # watermark passed last_ts + gap: nothing on time can extend
            # the open session — flush it and clear the carry
            start_us, last_us, n, tot, seq = state.get
            closed.append(_emit(user_id, seq, start_us, last_us, n, tot))
            state.remove()
            yield pd.DataFrame(closed, columns=_OUT_COLS)
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = (rows["ts"].to_numpy("datetime64[us]").astype("int64")).tolist()
        vals = rows["value"].to_numpy("float64").tolist()

        if state.exists:
            start_us, last_us, n, tot, seq = state.get
        else:
            start_us = last_us = ts_us[0]
            n, tot, seq = 0, 0.0, 1

        for t, v in zip(ts_us, vals):
            if n > 0 and t - last_us > gap_us:
                closed.append(_emit(user_id, seq, start_us, last_us, n, tot))
                seq += 1
                start_us, n, tot = t, 0, 0.0
            if n == 0:
                start_us = t
            n += 1
            tot += float(v)
            last_us = t

        deadline_us = last_us + gap_us
        wm_us = state.getCurrentWatermarkMs() * 1000
        if deadline_us <= wm_us:
            # backlog replay: the gap already elapsed in event time —
            # close now (setTimeoutTimestamp would reject a past instant)
            closed.append(_emit(user_id, seq, start_us, last_us, n, tot))
            state.remove()
        else:
            state.update((start_us, last_us, n, tot, seq))
            # ceil to ms so the instant stays STRICTLY above the watermark
            # (setTimeoutTimestamp rejects <= watermark)
            state.setTimeoutTimestamp(-(-deadline_us // 1000))
        yield pd.DataFrame(closed, columns=_OUT_COLS)

    return fn


def sessionize_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    schema: str = EVENT_SCHEMA,
    max_files_per_trigger: int | None = 1,
) -> None:
    """Drain all currently-available event files through the stateful
    sessionizer into an append-mode parquet sink.

    Exactly-once: the checkpoint carries consumed files AND per-user open
    sessions, so re-running after more epochs land continues sessions
    across runs. ``max_files_per_trigger=1`` makes each epoch file its
    own micro-batch so the watermark advances between epochs (None =
    one batch for everything — fewer barriers, later flushes)."""
    reader = spark.readStream.schema(schema).option("recursiveFileLookup", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_dir)
    sessions = (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_fn(gap_minutes),
            SESSION_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    q = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
