"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in windowed aggregations cover time-bucketed state; this is
the escape hatch for arbitrary per-key state machines (the brief's
"custom stateful operators").  Demonstrated operator: a per-user
running profile (event count, value sum, last-seen timestamp) that
emits an updated row per key per micro-batch and drops state for keys
idle past a timeout — O(active keys) state, Arrow-batched, the
production shape for fraud counters, rate limiters, session profiles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("sum_value_u", LongType(), False),
        StructField("last_ts", TimestampType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), False),
        StructField("sum_value_u", LongType(), False),
        StructField("last_us", LongType(), True),
    ]
)


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.hasTimedOut:
        # Timeout fire: no data, just evict the idle key's state.  Do not
        # re-arm the timeout or emit a row — otherwise state lives forever
        # and every timeout yields a spurious duplicate profile.
        state.remove()
        return
    n, s, last_us = state.get if state.exists else (0, 0, None)
    import numpy as np

    for pdf in pdfs:
        n += len(pdf)
        s += int(np.floor(pdf["value"].to_numpy() * 1_000_000.0).astype("int64").sum())
        us = int(pdf["ts"].max().value // 1000)
        last_us = us if last_us is None else max(last_us, us)
    state.update((n, s, last_us))
    state.setTimeoutDuration(24 * 3600 * 1000)  # drop idle keys after a day
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value_u": [s],
            "last_ts": [pd.Timestamp(last_us * 1000) if last_us is not None else None],
        }
    )


def user_profiles(events: DataFrame) -> DataFrame:
    """Per-user running profile over a stream (or batch, for testing the
    same semantics via groupBy)."""
    if not events.isStreaming:
        from pyspark.sql import functions as F

        return events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * F.lit(1000000.0)).cast("long")).alias("sum_value_u"),
            F.max("ts").alias("last_ts"),
        )
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
