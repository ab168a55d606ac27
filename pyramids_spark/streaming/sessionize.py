"""Stateful streaming sessionization — ``applyInPandasWithState``.

The streaming twin of the batch ``sessionize`` query (window lag + running
sum): events are grouped per user, sessions merge while consecutive events
are within ``gap``, and a session is EMITTED only once the event-time
WATERMARK passes ``session_end + gap`` — the point after which no legal
event can still extend or merge into it (any such event would be within
``gap`` of the end, hence older than the watermark, hence dropped
upstream). Until then a session stays in state, even when a later event in
the same batch already opened a newer one: with a gap-sized watermark
delay, a late event may legally land BETWEEN two in-state sessions and
merge them (append-mode output cannot be retracted, so early emission
would split sessions — code-review r3 finding).

State per user is the array of still-open sessions — bounded by
O(active sessions within the watermark horizon), not stream length; at
scale this runs on the RocksDB state store with the shuffle partitioned by
user.

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
#: parallel arrays of open sessions, epoch microseconds
_STATE_SCHEMA = "starts array<long>, ends array<long>, ns array<long>"


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

    def _emit(uid, sessions):
        return pd.DataFrame(
            {
                "user_id": [uid] * len(sessions),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in sessions],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in sessions],
                "n_events": [n for _, _, n in sessions],
            }
        )

    def _split_and_store(state, merged, wm_us):
        """Emit watermark-confirmed-closed sessions, keep the rest."""
        closed = [tuple(s) for s in merged if s[1] + gap_us <= wm_us]
        kept = [s for s in merged if s[1] + gap_us > wm_us]
        if kept:
            state.update((
                [s[0] for s in kept], [s[1] for s in kept], [s[2] for s in kept],
            ))
            # fire when the watermark passes the EARLIEST possible closure;
            # round UP to ms (ADVICE r3: floor truncation could re-arm a
            # timeout exactly at the current watermark ms with sub-ms event
            # times, which Spark rejects and kills the query)
            state.setTimeoutTimestamp((min(s[1] for s in kept) + gap_us + 999) // 1000)
        else:
            state.remove()
        return closed

    def fn(key, pdfs, state: GroupState):
        uid = key[0]
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.hasTimedOut:
            starts, ends, ns = state.get
            merged = [list(s) for s in zip(starts, ends, ns)]
            closed = _split_and_store(state, merged, wm_us)
            if closed:
                yield _emit(uid, closed)
            return
        times = []
        for pdf in pdfs:
            t = pd.to_datetime(pdf[ts]).astype("int64") // 1000  # ns → µs
            times.append(t.to_numpy())
        import numpy as np

        tt = np.sort(np.concatenate(times))
        # Build [start, end, n] intervals from this batch's (sorted) events,
        # then merge ALL stored open sessions in as intervals.  Out-of-order
        # arrivals across micro-batches (legal under the gap-sized global
        # watermark) are handled by construction: a late event pulls a
        # session's start back, opens its own earlier session, or BRIDGES
        # two stored sessions into one.
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
            starts, ends, ns = state.get
            intervals.extend([int(s), int(e), int(n)] for s, e, n in zip(starts, ends, ns))
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
        closed = _split_and_store(state, merged, wm_us)
        if closed:
            yield _emit(uid, closed)

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
