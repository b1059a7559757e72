"""Streaming per-key integer EWMA on Spark 4's transformWithState API,
with the applyInPandasWithState fallback where the protobuf state
server is unavailable — the same dual-path discipline as the CUSUM
drift detector (`streaming/drift.py`), running the IDENTICAL fold
kernel as the batch scan (`operators/resample.ewma_step`), so drained
-stream ≡ batch exactly, including across micro-batch boundaries.

Why in the engine: the smoothed value is the baseline every streaming
anomaly score subtracts; computing it in the stream (O(1) state: one
seeded flag + one long per key) is the difference between alerting on
the live event and alerting after the nightly batch.

State per key is two longs (seeded, s) in a ValueState.  Each
micro-batch sorts its rows per key by ts and folds; the state carries
the running smooth across batches — order within a batch is
deterministic because (user_id, ts) is unique in the corpus.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import LongType, StructField, StructType

from ..operators.resample import ewma_keyed, ewma_step, holt_keyed, holt_step
from .drift import _tws_available

__all__ = ["ewma_stream", "holt_stream"]

_STATE_SCHEMA = StructType(
    [
        StructField("seeded", LongType()),
        StructField("s", LongType()),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("value_u", LongType()),
        StructField("ewma_u", LongType()),
    ]
)


class _EwmaProcessor(StatefulProcessor):
    def __init__(self, den: int):
        self._den = den

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("ewma", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(rows)).sort_values(["ts_us"])
        seeded, s = (
            tuple(self._state.get()) if self._state.exists() else (0, 0)
        )
        out = []
        for ts_us, v_u in zip(pdf["ts_us"], pdf["value_u"]):
            s = ewma_step(s if seeded else None, int(v_u), self._den)
            seeded = 1
            out.append((int(key[0]), int(ts_us), int(v_u), s))
        self._state.update((seeded, s))
        yield pd.DataFrame(out, columns=["user_id", "ts_us", "value_u", "ewma_u"])

    def close(self) -> None:
        pass


def ewma_stream(
    events: DataFrame, den: int = 8, stream_api: str | None = None
) -> DataFrame:
    """Per-user streaming EWMA over (ts, value) → (user_id, ts_us,
    value_u, ewma_u), one output row per input row (append mode).

    Batch inputs delegate to the batch scan (`operators/resample.
    ewma_keyed`) so both faces are one kernel; streaming inputs run
    transformWithStateInPandas where the state server exists, else
    applyInPandasWithState — ``stream_api`` forces a path for the
    cross-API test, exactly like `cusum_drift_alerts`."""
    if stream_api not in (None, "transformWithState", "applyInPandasWithState"):
        raise ValueError(f"unknown stream_api: {stream_api!r}")
    slim = events.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.floor(F.col("value") * F.lit(1_000_000.0)).cast("long").alias("value_u"),
    )
    if not events.isStreaming:
        return ewma_keyed(
            slim, ["user_id"], "ts_us", "value_u", den=den, out_col="ewma_u"
        )
    use_tws = (
        stream_api == "transformWithState"
        if stream_api is not None
        else _tws_available()
    )
    if use_tws:
        return slim.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_EwmaProcessor(den),
            outputStructType=OUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )

    def update(key, pdfs, state):
        if state.hasTimedOut:  # pragma: no cover - no timeout armed
            state.remove()
            return
        seeded, s = tuple(state.get) if state.exists else (0, 0)
        pdf = pd.concat(list(pdfs)).sort_values("ts_us")
        out = []
        for ts_us, v_u in zip(pdf["ts_us"], pdf["value_u"]):
            s = ewma_step(s if seeded else None, int(v_u), den)
            seeded = 1
            out.append((int(key[0]), int(ts_us), int(v_u), s))
        state.update((seeded, s))
        yield pd.DataFrame(out, columns=["user_id", "ts_us", "value_u", "ewma_u"])

    from pyspark.sql.streaming.state import GroupStateTimeout

    return slim.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_HOLT_STATE_SCHEMA = StructType(
    [
        StructField("seeded", LongType()),
        StructField("lv", LongType()),
        StructField("tr", LongType()),
    ]
)

HOLT_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("value_u", LongType()),
        StructField("level_u", LongType()),
        StructField("trend_u", LongType()),
    ]
)


class _HoltProcessor(StatefulProcessor):
    def __init__(self, a_d: int, b_d: int):
        self._a, self._b = a_d, b_d

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("holt", _HOLT_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(rows)).sort_values(["ts_us"])
        seeded, lv, tr = (
            tuple(self._state.get()) if self._state.exists() else (0, 0, 0)
        )
        out = []
        for ts_us, v_u in zip(pdf["ts_us"], pdf["value_u"]):
            lv, tr = holt_step((lv, tr) if seeded else None, int(v_u), self._a, self._b)
            seeded = 1
            out.append((int(key[0]), int(ts_us), int(v_u), lv, tr))
        self._state.update((seeded, lv, tr))
        yield pd.DataFrame(
            out, columns=["user_id", "ts_us", "value_u", "level_u", "trend_u"]
        )

    def close(self) -> None:
        pass


def holt_stream(
    events: DataFrame,
    alpha_den: int = 4,
    beta_den: int = 8,
    stream_api: str | None = None,
) -> DataFrame:
    """Per-user streaming Holt linear-trend smoothing — `ewma_stream`'s
    trend-aware sibling, same dual-path contract: batch inputs delegate
    to the batch scan (`operators/resample.holt_keyed`), streaming
    inputs run transformWithStateInPandas where the state server
    exists, else applyInPandasWithState; all three paths share
    `holt_step`, so drained-stream ≡ batch exactly.  State per key is
    three longs (seeded, level, trend)."""
    if stream_api not in (None, "transformWithState", "applyInPandasWithState"):
        raise ValueError(f"unknown stream_api: {stream_api!r}")
    slim = events.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.floor(F.col("value") * F.lit(1_000_000.0)).cast("long").alias("value_u"),
    )
    if not events.isStreaming:
        out = holt_keyed(
            slim, ["user_id"], "ts_us", "value_u",
            alpha_den=alpha_den, beta_den=beta_den,
        )
        return out.select(
            "user_id", "ts_us", "value_u",
            F.col("level").alias("level_u"), F.col("trend").alias("trend_u"),
        )
    use_tws = (
        stream_api == "transformWithState"
        if stream_api is not None
        else _tws_available()
    )
    if use_tws:
        return slim.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_HoltProcessor(alpha_den, beta_den),
            outputStructType=HOLT_OUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )

    def update(key, pdfs, state):
        if state.hasTimedOut:  # pragma: no cover - no timeout armed
            state.remove()
            return
        seeded, lv, tr = tuple(state.get) if state.exists else (0, 0, 0)
        pdf = pd.concat(list(pdfs)).sort_values("ts_us")
        out = []
        for ts_us, v_u in zip(pdf["ts_us"], pdf["value_u"]):
            lv, tr = holt_step((lv, tr) if seeded else None, int(v_u), alpha_den, beta_den)
            seeded = 1
            out.append((int(key[0]), int(ts_us), int(v_u), lv, tr))
        state.update((seeded, lv, tr))
        yield pd.DataFrame(
            out, columns=["user_id", "ts_us", "value_u", "level_u", "trend_u"]
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return slim.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=HOLT_OUT_SCHEMA,
        stateStructType=_HOLT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
