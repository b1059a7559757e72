"""Per-key CUSUM drift detection on Spark 4's transformWithState API —
the successor to applyInPandasWithState — with an automatic fallback
to the older API where transformWithState's protobuf state server is
unavailable (this container): both paths run the IDENTICAL integer
kernel, so the choice is invisible in results.

CUSUM (Page 1954): after a warmup that fixes the reference mean, track
one-sided cumulative sums of deviations

    pos' = max(0, pos + (v − mean) − slack)
    neg' = max(0, neg − (v − mean) − slack)

and raise an alert when either crosses the threshold h, then reset the
accumulators (the reference mean stays — the detector keeps firing
while the level stays shifted, which is the monitoring contract).  All
arithmetic is integer micro-units, so the alert sequence is a pure
function of the ordered event sequence — batch replay and incremental
streaming replay agree exactly, which the convergence test pins.

State per key is four longs (n, sum during warmup → mean after, pos,
neg) in a ValueState — O(1) per key, no history buffer: CUSUM is the
O(1)-state cousin of the O(W) rolling z-score in `anomaly.py`.

Scale: keys partition the stream; each executor holds only its keys'
16-byte states in the state store. The warmup mean is the first-W
running mean — deterministic, no RNG, no floats.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import LongType, StructField, StructType

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("acc", LongType()),   # Σ value_u during warmup; mean_u after
        StructField("pos", LongType()),
        StructField("neg", LongType()),
    ]
)

def _tws_available() -> bool:
    """transformWithState runs a protobuf-based state server between the
    JVM and a dedicated Python driver worker; without protobuf the
    worker crashes at init.  Gate on the import so this module picks
    the API the environment can actually run."""
    try:  # pragma: no cover - environment probe
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("direction", LongType()),  # +1 upward shift, -1 downward
        StructField("magnitude_u", LongType()),
    ]
)


def cusum_step(state, v_u: int, warmup: int, slack_u: int, threshold_u: int):
    """One CUSUM update.  ``state`` is (n, acc, pos, neg); returns
    (new_state, alert) with alert = None or (direction, magnitude)."""
    n, acc, pos, neg = state
    if n < warmup:
        n += 1
        acc += v_u
        if n == warmup:
            acc = acc // warmup  # acc becomes the frozen reference mean
        return (n, acc, 0, 0), None
    dev = v_u - acc
    pos = max(0, pos + dev - slack_u)
    neg = max(0, neg - dev - slack_u)
    if pos > threshold_u:
        return (n + 1, acc, 0, 0), (1, pos)
    if neg > threshold_u:
        return (n + 1, acc, 0, 0), (-1, neg)
    return (n + 1, acc, pos, neg), None


def cusum_replay(rows, warmup: int, slack_u: int, threshold_u: int):
    """Reference replay over an ordered (ts_us, value_u) iterable —
    the batch face AND the per-batch kernel (the streaming processor
    feeds it incrementally from its saved state)."""
    state = (0, 0, 0, 0)
    alerts = []
    for ts_us, v_u in rows:
        state, alert = cusum_step(state, v_u, warmup, slack_u, threshold_u)
        if alert is not None:
            alerts.append((ts_us, alert[0], alert[1]))
    return state, alerts


class _CusumProcessor(StatefulProcessor):
    def __init__(self, warmup: int, slack_u: int, threshold_u: int):
        self._params = (warmup, slack_u, threshold_u)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("cusum", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        warmup, slack_u, threshold_u = self._params
        pdfs = list(rows)
        pdf = pd.concat(pdfs).sort_values(["ts_us"])
        st = tuple(self._state.get()) if self._state.exists() else (0, 0, 0, 0)
        state = st
        out = []
        for ts_us, v_u in zip(pdf["ts_us"], pdf["value_u"]):
            state, alert = cusum_step(state, int(v_u), warmup, slack_u, threshold_u)
            if alert is not None:
                out.append((int(key[0]), int(ts_us), alert[0], alert[1]))
        self._state.update(state)
        yield pd.DataFrame(out, columns=["user_id", "ts_us", "direction", "magnitude_u"])

    def close(self) -> None:
        pass


def cusum_drift_alerts(
    events: DataFrame,
    warmup: int = 20,
    slack_u: int = 200_000,
    threshold_u: int = 2_000_000,
    stream_api: str | None = None,
) -> DataFrame:
    """Per-user CUSUM drift alerts over (ts, value).

    Streaming inputs run on transformWithStateInPandas (one ValueState
    of four longs per key); batch inputs run the identical kernel via
    `applyInPandas` over the full ordered history.  The convergence
    test pins drained-stream ≡ batch, including across micro-batch
    boundaries (state carries the warmup and accumulators).

    ``stream_api`` forces a streaming path — "transformWithState" or
    "applyInPandasWithState" — instead of the environment probe; the
    cross-API pytest uses it to assert both paths run the identical
    kernel wherever transformWithState's state server exists."""
    if stream_api not in (None, "transformWithState", "applyInPandasWithState"):
        raise ValueError(f"unknown stream_api: {stream_api!r}")
    slim = events.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.floor(F.col("value") * F.lit(1_000_000.0)).cast("long").alias("value_u"),
    )
    if events.isStreaming:
        use_tws = (
            stream_api == "transformWithState"
            if stream_api is not None
            else _tws_available()
        )
        if use_tws:
            return slim.groupBy("user_id").transformWithStateInPandas(
                statefulProcessor=_CusumProcessor(warmup, slack_u, threshold_u),
                outputStructType=OUT_SCHEMA,
                outputMode="Append",
                timeMode="None",
            )
        # transformWithState's state-server protocol needs protobuf; in
        # environments without it (this container), the identical kernel
        # runs on the older applyInPandasWithState API — same state
        # tuple, same integer math, same output.
        def update(key, pdfs, state):
            if state.hasTimedOut:  # pragma: no cover - no timeout armed
                state.remove()
                return
            st = tuple(state.get) if state.exists else (0, 0, 0, 0)
            pdf = pd.concat(list(pdfs)).sort_values("ts_us")
            out = []
            for ts_us, v_u in zip(pdf["ts_us"], pdf["value_u"]):
                st, alert = cusum_step(st, int(v_u), warmup, slack_u, threshold_u)
                if alert is not None:
                    out.append((int(key[0]), int(ts_us), alert[0], alert[1]))
            state.update(st)
            yield pd.DataFrame(
                out, columns=["user_id", "ts_us", "direction", "magnitude_u"]
            )

        from pyspark.sql.streaming.state import GroupStateTimeout

        return slim.groupBy("user_id").applyInPandasWithState(
            update,
            outputStructType=OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts_us")
        _, alerts = cusum_replay(
            zip(pdf["ts_us"], (int(v) for v in pdf["value_u"])),
            warmup,
            slack_u,
            threshold_u,
        )
        uid = int(pdf["user_id"].iloc[0])
        return pd.DataFrame(
            [(uid, ts, d, m) for ts, d, m in alerts],
            columns=["user_id", "ts_us", "direction", "magnitude_u"],
        )

    return slim.groupBy("user_id").applyInPandas(run, schema=OUT_SCHEMA)
