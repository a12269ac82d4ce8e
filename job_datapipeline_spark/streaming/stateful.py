"""Custom stateful streaming operator: sessionization with explicit state.

``F.session_window`` covers plain gap-sessionization; this operator exists
for the semantics the built-in cannot express — the session summary row is
emitted EXACTLY ONCE, either the moment a later event from the same user
proves the session closed (gap exceeded in-flight) or when event time
(the watermark) passes the session's gap horizon and the state times out.
That "emit on close, with custom payload, then forget the key" shape is the
streaming form of the reference's per-run accumulate-then-flush loop
(glassdoor-scraper/src/main.py:35-60 accumulates listings, flushes once at
end of run) with bounded state instead of an unbounded in-process list.

Implementation: ``applyInPandasWithState`` grouped by user, Arrow-batched
pandas per group, ``GroupState`` carrying (session_start, last_ts, n_events)
as epoch-ms longs, ``EventTimeTimeout`` keyed to last_ts + gap. State is
O(active users), not O(events): every closed session leaves the store.

Timezone contract: epoch arithmetic assumes the engine's fixed UTC session
timezone (session.py sets it; Arrow hands the worker naive-UTC datetimes).

Determinism (what makes the DuckDB oracle possible): with one data batch —
AvailableNow over fewer than maxFilesPerTrigger files — the emitted set is
exactly (a) every session followed by a later session of the same user,
plus (b) final sessions whose (last_ts + gap) < (max event ts - watermark
delay), because the post-batch no-data micro-batch fires timeouts strictly
below the final watermark. Both are plain SQL over the batch table.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..deploy import ensure_shipped
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# (session_start_us, last_ts_us, n_events) — epoch MICROseconds: timestamps
# round-trip at full parquet precision (ms would truncate µs digits)
SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _to_us(s: pd.Series) -> pd.Series:
    return s.astype("datetime64[ns]").astype("int64") // 1_000


def _row(user_id: int, start_us: int, last_us: int, n: int) -> dict[str, Any]:
    return {
        "user_id": user_id,
        "session_start": pd.to_datetime(start_us, unit="us"),
        "session_end": pd.to_datetime(last_us, unit="us"),
        "n_events": n,
    }


def sessionize_stateful(
    events: DataFrame,
    gap_seconds: int = 30 * 60,
    watermark: str = "1 second",
) -> DataFrame:
    """Streaming DataFrame of closed sessions (user_id, session_start,
    session_end, n_events), one row per session, emitted on close.

    ``session_end`` is the LAST EVENT's timestamp (matching the batch
    gaps-and-islands twin ``events_sessionize`` exactly), not last + gap as
    ``F.session_window`` reports — one reason this is a custom operator.
    """
    gap_us = gap_seconds * 1_000_000

    def close_sessions(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        out: list[dict[str, Any]] = []
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            out.append(_row(user_id, start_us, last_us, n))
            state.remove()
        else:
            # a group's rows can arrive split across Arrow batches in any
            # order — gather everything, sort ONCE, then sessionize
            # vectorized (diff > gap marks boundaries); no per-event loop
            chunks = list(pdfs)
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            ts_us = _to_us(pdf["ts"]).to_numpy()
            order = np.lexsort((pdf["event_id"].to_numpy(), ts_us))
            us = ts_us[order]
            sessions: list[tuple[int, int, int]] = []
            if len(us):
                breaks = np.nonzero(np.diff(us) > gap_us)[0]
                starts = np.concatenate(([0], breaks + 1))
                ends = np.concatenate((breaks, [len(us) - 1]))
                sessions = [
                    (int(us[s]), int(us[e]), int(e - s + 1))
                    for s, e in zip(starts, ends)
                ]
            if state.exists:
                s0, l0, n0 = state.get
                if sessions and sessions[0][0] - l0 <= gap_us:
                    _, le, ne = sessions[0]
                    sessions[0] = (s0, max(l0, le), n0 + ne)
                else:
                    sessions.insert(0, (s0, l0, n0))
            for s, last, n in sessions[:-1]:
                out.append(_row(user_id, s, last, n))
            if sessions:
                cur = sessions[-1]
                state.update(cur)
                # timeout API is ms-granular: round UP so it never fires
                # before the µs horizon; never set a timeout at/below the
                # current watermark (Spark rejects it)
                state.setTimeoutTimestamp(
                    max(-(-(cur[1] + gap_us) // 1000), state.getCurrentWatermarkMs() + 1)
                )
        yield pd.DataFrame(out, columns=[f.name for f in SESSION_OUT.fields])

    ensure_shipped(events.sparkSession)
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            close_sessions,
            outputStructType=SESSION_OUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
