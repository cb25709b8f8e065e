"""Stateful streaming sessionization — ``applyInPandasWithState``.

The batch shape of this operator is ``api_pipeline.q_event_sessions``
(lag -> running sum -> groupBy, one Exchange). The streaming shape
cannot use a running sum (events arrive over many micro-batches), so it
is the canonical custom-stateful-operator pattern: group the stream by
``user_id`` and keep per-user GroupState = the OPEN session
(session counter, start/last microseconds, event count, value sum).

Per micro-batch and user, events fold into the state in (us, event_id)
order; a gap > ``SESSION_GAP_US`` CLOSES the open session (emitting one
output row) and opens the next. The still-open session stays in state
across micro-batches, exactly like a watermarked session window's
intermediate state. ``ProcessingTimeTimeout`` flushes idle users'
open sessions so state cannot grow unbounded when a user goes quiet
(the streaming analog of watermark-driven eviction; at 100 TB the state
store shards by the same user_id hash partitioning as the batch
operator's single Exchange).

Equivalence contract (tested in ``tests/test_streaming.py``): over a
finite stream, the CLOSED sessions equal the batch operator's result
minus each user's final (still-open) session — regardless of how the
events were split across micro-batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..api_pipeline import SESSION_GAP_US

OUTPUT_SCHEMA = (
    "user_id long, session_id long, n_events long, "
    "start_us long, end_us long, duration_us long, sum_value double"
)
STATE_SCHEMA = (
    "session_id long, start_us long, last_us long, "
    "n_events long, sum_value double"
)


def _make_sessionizer(idle_timeout_ms: int | None):
    def _sessionize_user(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            sid, start_us, last_us, n, sv = state.get
        else:
            sid, start_us, last_us, n, sv = 0, None, None, 0, 0.0

        closed: list[tuple] = []

        def close():
            closed.append(
                (user_id, sid, n, start_us, last_us, last_us - start_us, sv)
            )

        if state.hasTimedOut:
            # idle user: flush the open session but KEEP the session
            # counter as a tombstone (n=0, no open session) — removing
            # it would restart a returning user at session_id 1 and
            # emit duplicate (user_id, session_id) keys for downstream
            # keyed sinks. The tombstone is 5 scalars per ever-seen
            # user and takes no further timeouts until the user
            # returns; a deploy that must bound state by ACTIVE users
            # instead would derive ids from start_us and give up the
            # batch operator's 1..n per-user numbering.
            if n > 0:
                close()
            state.update((sid, None, None, 0, 0.0))
        else:
            batch = pd.concat(list(pdfs), ignore_index=True)
            batch = batch.sort_values(["us", "event_id"])
            for us, val in zip(batch["us"], batch["value"]):
                us = int(us)
                val = float(val)
                if last_us is None:
                    sid += 1
                    start_us, last_us, n, sv = us, us, 1, val
                elif us - last_us > SESSION_GAP_US:
                    close()
                    sid += 1
                    start_us, last_us, n, sv = us, us, 1, val
                else:
                    last_us = us
                    n += 1
                    sv += val
            state.update((sid, start_us, last_us, n, sv))
            if idle_timeout_ms is not None:
                state.setTimeoutDuration(idle_timeout_ms)

        yield pd.DataFrame(
            closed,
            columns=[
                "user_id", "session_id", "n_events",
                "start_us", "end_us", "duration_us", "sum_value",
            ],
        )

    return _sessionize_user


def sessionize_stream(
    events_stream: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """CLOSED sessions for a streaming (event_id, ts, user_id, value)
    relation — one output row per session, emitted when the session's
    gap is observed (or, with ``idle_timeout_ms`` set, when its user
    times out idle).

    ``idle_timeout_ms=None`` (default) keeps open sessions in state
    until their gap arrives — correct for finite replays and for the
    batch-equivalence contract (a processing-time timeout would close
    sessions nondeterministically whenever a micro-batch stalls longer
    than the timeout). A 24/7 deploy sets it (e.g. 30 min) so idle
    users' state is flushed and bounded."""
    keyed = events_stream.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "value",
    )
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
