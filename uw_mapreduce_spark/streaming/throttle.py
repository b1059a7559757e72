"""Streaming debounce / rate-limit: the `operators/debounce` greedy
min-gap kernel as a keyed stateful streaming operator — "emit at most
one event per key per gap" enforced incrementally.

State per key is ONE long (timestamp of the last KEPT event), read and
advanced by the identical integer rule the batch operator applies
(`operators/debounce.debounce`), so a drained stream emits exactly the
batch face's kept rows — the CUSUM module's dual-path discipline
(`streaming/drift.py`): transformWithState where its protobuf state
server exists, applyInPandasWithState otherwise, the same kernel in
both.

Scale: keys partition the stream; each executor holds an 8-byte state
per key.  Emission is append-mode (kept rows only) — the throttled
stream is itself a stream.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import LongType, StringType, StructField, StructType

from .drift import _tws_available

_STATE_SCHEMA = StructType([StructField("last_kept", LongType())])

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
    ]
)


def debounce_step(last_kept: int | None, ts_us: int, gap: int):
    """One debounce decision: returns (new_last_kept, kept)."""
    if last_kept is None or ts_us - last_kept >= gap:
        return ts_us, True
    return last_kept, False


def _drain(key, pdfs, last_kept: int | None, gap: int):
    pdf = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
    out = []
    for ts_us, eid in zip(pdf["ts_us"], pdf["event_id"]):
        last_kept, kept = debounce_step(last_kept, int(ts_us), gap)
        if kept:
            out.append((int(key[0]), str(key[1]), int(eid), int(ts_us)))
    return last_kept, pd.DataFrame(
        out, columns=["user_id", "event_type", "event_id", "ts_us"]
    )


class _ThrottleProcessor(StatefulProcessor):
    def __init__(self, gap: int):
        self._gap = gap

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("last_kept", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        last = self._state.get()[0] if self._state.exists() else None
        last, out = _drain(key, rows, last, self._gap)
        self._state.update((last,))
        yield out

    def close(self) -> None:
        pass


def throttled_events(
    events: DataFrame,
    gap: int = 48 * 3600 * 1_000_000,
    stream_api: str | None = None,
) -> DataFrame:
    """Kept-rows-only debounce of (user_id, event_type)-keyed events.

    Streaming inputs run the one-long-state kernel incrementally;
    batch inputs delegate to `operators/debounce.debounce` and filter
    to kept rows — the convergence pytest pins drained ≡ batch."""
    if stream_api not in (None, "transformWithState", "applyInPandasWithState"):
        raise ValueError(f"unknown stream_api: {stream_api!r}")
    slim = events.select(
        "user_id", "event_type", "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    if not events.isStreaming:
        from ..operators.debounce import debounce

        tagged = debounce(
            slim, ["user_id", "event_type"], "ts_us", gap, tiebreak=["event_id"]
        )
        return tagged.where(F.col("kept")).drop("kept")

    use_tws = (
        stream_api == "transformWithState" if stream_api is not None else _tws_available()
    )
    if use_tws:
        return slim.groupBy("user_id", "event_type").transformWithStateInPandas(
            statefulProcessor=_ThrottleProcessor(gap),
            outputStructType=OUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )

    def update(key, pdfs, state):
        if state.hasTimedOut:  # pragma: no cover - no timeout armed
            state.remove()
            return
        last = state.get[0] if state.exists else None
        last, out = _drain(key, pdfs, last, gap)
        state.update((last,))
        yield out

    from pyspark.sql.streaming.state import GroupStateTimeout

    return slim.groupBy("user_id", "event_type").applyInPandasWithState(
        update,
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SESS_STATE_SCHEMA = StructType(
    [
        StructField("prev_ts", LongType()),
        StructField("anchor", LongType()),
        StructField("sid", LongType()),
    ]
)

SESS_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("session_seq", LongType()),
    ]
)


def _sess_drain(key, pdfs, st, gap: int, max_dur: int):
    prev, anchor, sid = st
    pdf = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
    out = []
    for ts_us, eid in zip(pdf["ts_us"], pdf["event_id"]):
        t = int(ts_us)
        if prev is None or t - prev > gap or t - anchor > max_dur:
            sid = (sid or 0) + 1
            anchor = t
        prev = t
        out.append((int(key[0]), int(eid), t, int(sid)))
    return (prev, anchor, sid), pd.DataFrame(
        out, columns=["user_id", "event_id", "ts_us", "session_seq"]
    )


class _SessionProcessor(StatefulProcessor):
    def __init__(self, gap: int, max_dur: int):
        self._gap, self._max_dur = gap, max_dur

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("sess", _SESS_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        st = tuple(self._state.get()) if self._state.exists() else (None, None, 0)
        st, out = _sess_drain(key, rows, st, self._gap, self._max_dur)
        self._state.update(st)
        yield out

    def close(self) -> None:
        pass


def sessionized_events(
    events: DataFrame,
    gap: int = 24 * 3600 * 1_000_000,
    max_dur: int = 72 * 3600 * 1_000_000,
    stream_api: str | None = None,
) -> DataFrame:
    """Streaming twin of `operators/sessions.sessionize_capped` keyed
    on user_id: three longs of state (prev_ts, anchor, session#) —
    the CUSUM/throttle dual-path discipline; batch inputs delegate to
    the batch operator so drained ≡ batch is testable."""
    if stream_api not in (None, "transformWithState", "applyInPandasWithState"):
        raise ValueError(f"unknown stream_api: {stream_api!r}")
    slim = events.select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    if not events.isStreaming:
        from ..operators.sessions import sessionize_capped

        return sessionize_capped(
            slim, ["user_id"], "ts_us", gap=gap, max_dur=max_dur,
            tiebreak=["event_id"],
        ).select("user_id", "event_id", "ts_us", "session_seq")

    use_tws = (
        stream_api == "transformWithState" if stream_api is not None else _tws_available()
    )
    if use_tws:
        return slim.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_SessionProcessor(gap, max_dur),
            outputStructType=SESS_OUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )

    def update(key, pdfs, state):
        if state.hasTimedOut:  # pragma: no cover - no timeout armed
            state.remove()
            return
        st = tuple(state.get) if state.exists else (None, None, 0)
        st, out = _sess_drain(key, pdfs, st, gap, max_dur)
        state.update(st)
        yield out

    from pyspark.sql.streaming.state import GroupStateTimeout

    return slim.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESS_OUT_SCHEMA,
        stateStructType=_SESS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
