"""Streaming rolling z-score outliers: the stateful twin of
``operators/anomaly.rolling_zscore_anomalies``.

Per-key state is the trailing window of the last W values (a bounded
list — O(W) per active key); each arriving point is judged against its
history with the SAME cross-multiplied integer inequality as the batch
operator,

    (n·x − Σ)² > k² · (n·Σx² − Σ²),

then pushed into the window.  ``applyInPandasWithState`` carries the
state across micro-batches Arrow-batched.

Ordering contract (stated, not hidden): rows are processed in
(ts_us, event_id) order WITHIN each batch; across batches the detector
sees arrival order.  When the source replays in event order (file
replay, ordered log partitions), the stream output is row-for-row
identical to the batch operator — the convergence pytest pins exactly
that.  Out-of-order arrival degrades gracefully (a late point is
judged against the history present at arrival), which is the standard
streaming-detector semantic; use the batch operator for retrospective
exactness.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("event_id", LongType(), False),
        StructField("ts_us", LongType(), False),
        StructField("value_m", LongType(), False),
    ]
)

STATE_SCHEMA = StructType([StructField("hist", ArrayType(LongType()), False)])


def _make_detector(window: int, k: int, min_history: int):
    def detect(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        hist: list[int] = list(state.get[0]) if state.exists else []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_us", "event_id"], kind="mergesort")
        out = []
        k2 = k * k
        for r in rows.itertuples(index=False):
            x = int(r.value_m)
            n = len(hist)
            if n >= min_history:
                s = sum(hist)
                ss = sum(h * h for h in hist)
                dev = n * x - s
                if dev * dev > k2 * (n * ss - s * s):
                    out.append((user_id, int(r.event_id), int(r.ts_us), x))
            hist.append(x)
            if len(hist) > window:
                hist = hist[-window:]
        state.update((hist,))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "event_id", "ts_us", "value_m"])

    return detect


def rolling_zscore_stream(events: DataFrame, *, window: int = 20, k: int = 3,
                          min_history: int = 10) -> DataFrame:
    """Anomalous rows from a stream of (user_id, event_id, ts_us,
    value_m).  Batch inputs route to the batch operator (same
    semantics, exact windows) so one call site serves both faces."""
    if not events.isStreaming:
        from ..operators.anomaly import rolling_zscore_anomalies

        return rolling_zscore_anomalies(
            events, ["user_id"], ["ts_us", "event_id"], "value_m",
            window=window, k=k, min_history=min_history,
        ).select("user_id", "event_id", "ts_us", "value_m")
    return events.groupBy("user_id").applyInPandasWithState(
        _make_detector(window, k, min_history),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
