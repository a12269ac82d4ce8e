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


def _frame(
    user_id: int, starts_us: np.ndarray, lasts_us: np.ndarray, counts: np.ndarray
) -> pd.DataFrame:
    """Vectorized emission frame — ONE pd.to_datetime per column, not per
    session (scalar conversion was the hot path at ~1e5 emitted sessions)."""
    return pd.DataFrame(
        {
            "user_id": np.full(len(starts_us), user_id, dtype="int64"),
            "session_start": pd.to_datetime(starts_us, unit="us"),
            "session_end": pd.to_datetime(lasts_us, unit="us"),
            "n_events": np.asarray(counts, dtype="int64"),
        }
    )


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
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield _frame(
                user_id,
                np.array([start_us], dtype="int64"),
                np.array([last_us], dtype="int64"),
                np.array([n], dtype="int64"),
            )
            return
        # a group's rows can arrive split across Arrow batches in any
        # order — gather everything, sort ONCE, then sessionize
        # vectorized (diff > gap marks boundaries); no per-event loop
        chunks = list(pdfs)
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        ts_us = _to_us(pdf["ts"]).to_numpy()
        order = np.lexsort((pdf["event_id"].to_numpy(), ts_us))
        us = ts_us[order]
        if len(us):
            breaks = np.nonzero(np.diff(us) > gap_us)[0]
            s_idx = np.concatenate(([0], breaks + 1))
            e_idx = np.concatenate((breaks, [len(us) - 1]))
            starts, lasts = us[s_idx], us[e_idx]
            counts = e_idx - s_idx + 1
        else:
            starts = lasts = counts = np.empty(0, dtype="int64")
        if state.exists:
            s0, l0, n0 = state.get
            if len(starts) and starts[0] - l0 <= gap_us:
                starts[0] = s0
                lasts[0] = max(l0, lasts[0])
                counts[0] += n0
            else:
                starts = np.concatenate(([s0], starts))
                lasts = np.concatenate(([l0], lasts))
                counts = np.concatenate(([n0], counts))
        if len(starts):
            cur_last = int(lasts[-1])
            state.update((int(starts[-1]), cur_last, int(counts[-1])))
            # timeout API is ms-granular: round UP so it never fires
            # before the µs horizon; never set a timeout at/below the
            # current watermark (Spark rejects it)
            state.setTimeoutTimestamp(
                max(-(-(cur_last + gap_us) // 1000), state.getCurrentWatermarkMs() + 1)
            )
            if len(starts) > 1:
                yield _frame(user_id, starts[:-1], lasts[:-1], counts[:-1])

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


def _tws_available() -> tuple[bool, str]:
    """transformWithState's Python worker speaks a protobuf-based state
    protocol; without the protobuf package the TWS driver worker crashes at
    init (observed: ImportError 'google.protobuf ... descriptor'). Probe
    once so callers fail fast with a clear message instead of a mid-stream
    [STREAM_FAILED] crash."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True, ""
    except ImportError as e:  # pragma: no cover - env-dependent
        return False, str(e)


def user_totals_tws(events: DataFrame) -> DataFrame:
    """Running per-user totals via ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-stateful API (StatefulProcessor + typed state
    handles; successor to applyInPandasWithState). Each micro-batch emits
    the user's CUMULATIVE (n_events, total_value) so far; the final row
    per user equals the batch groupBy — the cross-batch state-carry proof.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``) and the ``protobuf`` package
    in the Python environment; raises ImportError with the probe detail
    when protobuf is missing (this container ships without it — the
    operator is exercised by tests/test_streaming.py when available and
    skip-documented otherwise, same pattern as the video codec seam).
    """
    ok, detail = _tws_available()
    if not ok:
        raise ImportError(
            "transformWithStateInPandas needs the protobuf package for its "
            f"state-server protocol; not importable here: {detail}"
        )

    processor, out_schema = totals_stateful_processor()
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=processor,
        outputStructType=out_schema,
        outputMode="append",
        timeMode="None",
    )


def totals_stateful_processor():
    """Build the (StatefulProcessor, output schema) pair user_totals_tws
    hands to transformWithStateInPandas. Exposed separately so the state
    transitions can be driven WITHOUT the protobuf worker: the processor
    only talks to its handle through getValueState/exists/get/update, so a
    test can inject an in-memory handle and replay micro-batches —
    proving handleInputRows' cumulative semantics in environments where
    the TWS state server can't start (this container lacks protobuf).
    The class itself imports cleanly either way; only the streaming
    runtime needs the protocol."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    state_schema = StructType(
        [StructField("n", LongType()), StructField("s", DoubleType())]
    )
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._tot = handle.getValueState("tot", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, s = self._tot.get() if self._tot.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._tot.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [s]}
            )

        def close(self) -> None:
            pass

    return _Totals(), out_schema
