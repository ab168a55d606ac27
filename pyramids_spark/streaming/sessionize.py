"""Stateful streaming sessionization — ``applyInPandasWithState``.

The streaming twin of the batch ``sessionize`` query (window lag + running
sum): events are grouped per user, sessions merge while consecutive events
are within ``gap``, and a session is EMITTED once the event-time watermark
guarantees no earlier event can still arrive (event-time timeout at
``session_end + gap``). State per user is one (start, end, n) triple —
bounded regardless of stream length; at scale this runs on the RocksDB
state store with the shuffle partitioned by user.

Reference scope note: the reference engine is batch-only; this operator is
part of the Spark-first streaming surface (SURVEY §2.10) mirroring its
temporal aggregation semantics.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
_STATE_SCHEMA = "start long, end long, n long"  # epoch microseconds


def stream_sessionize(
    stream: DataFrame,
    gap_minutes: int = 30,
    ts: str = "ts",
    user: str = "user_id",
) -> DataFrame:
    """(ts, user_id, …) stream → closed (user_id, session_start,
    session_end, n_events) rows, 30-min-gap semantics (≙ the batch
    ``sessionize`` oracle)."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        uid = key[0]
        if state.hasTimedOut:
            # watermark passed end+gap: the open session can never grow
            (s0, e0, n0) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [uid],
                    "session_start": [pd.Timestamp(s0, unit="us")],
                    "session_end": [pd.Timestamp(e0, unit="us")],
                    "n_events": [n0],
                }
            )
            return
        times = []
        for pdf in pdfs:
            t = pd.to_datetime(pdf[ts]).astype("int64") // 1000  # ns → µs
            times.append(t.to_numpy())
        import numpy as np

        tt = np.sort(np.concatenate(times))
        # Build [start, end, n] intervals from this batch's (sorted) events,
        # then merge the stored open session in as one more interval.  This
        # keeps semantics right for out-of-order arrivals across micro-batches
        # (legal under the gap-sized global watermark): an event older than the
        # stored start pulls start back to min(t, start), and an event more
        # than `gap` older than the stored start forms its own earlier session
        # instead of being folded into the later one.
        intervals = []  # [start, end, n], start-ordered within the batch
        cur = None
        for t in tt:
            if cur is None or t - cur[1] > gap_us:
                if cur is not None:
                    intervals.append(cur)
                cur = [int(t), int(t), 0]
            cur[1] = int(t)
            cur[2] += 1
        if cur is not None:
            intervals.append(cur)
        if state.exists:
            intervals.append(list(state.get))
            intervals.sort(key=lambda s: s[0])
        merged = []
        for iv in intervals:
            if merged and iv[0] - merged[-1][1] <= gap_us:
                m = merged[-1]
                m[0] = min(m[0], iv[0])
                m[1] = max(m[1], iv[1])
                m[2] += iv[2]
            else:
                merged.append(iv)
        if not merged:
            return
        # All but the newest interval are separated from it by > gap on this
        # side of the watermark; emit them closed, keep the newest open.
        sessions = [tuple(s) for s in merged[:-1]]
        cur = merged[-1]
        state.update(tuple(cur))
        # event-time timeout: fire when the watermark passes end + gap
        state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)  # µs → ms
        if sessions:
            yield pd.DataFrame(
                {
                    "user_id": [uid] * len(sessions),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in sessions],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in sessions],
                    "n_events": [n for _, _, n in sessions],
                }
            )

    return (
        stream.withWatermark(ts, f"{gap_minutes} minutes")
        .groupBy(user)
        .applyInPandasWithState(
            fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
