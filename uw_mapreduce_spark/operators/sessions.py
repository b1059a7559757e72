"""Capped sessionization: gap-based sessions that ALSO split when the
running session exceeds a maximum duration.

Pure gap sessionization is declarative (lag + cumulative sum — the
`session_conversion_rate` face); adding a duration cap makes it a
greedy sequential rule: a new session starts when

    t − prev_t > gap      (the classic inactivity split)
 OR t − anchor > max_dur  (anchor = start of the CURRENT session),

and the anchor resets on every split — so event i's session depends on
where earlier splits landed, exactly the keep-chain structure of
`operators/debounce`.  Every step is integer arithmetic on two longs
of state (prev_t, anchor), so a DuckDB recursive CTE replays it
exactly and the operator is fully value-hash oracled.

The cap is what real analytics stacks add on top of gap sessions
(bot/kiosk streams that never pause would otherwise produce unbounded
sessions — memory poison for any downstream per-session aggregate).

Scale: one hash repartition on the key + in-partition secondary sort,
then a partition-level Arrow `mapInPandas` scan — one Python call per
PARTITION (the per-group `applyInPandas` alternative pays ~1 ms of
Arrow overhead per key; see `operators/debounce.py`).  Group and
session state carry across Arrow record batches.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

__all__ = ["sessionize_capped"]


def sessionize_capped(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    gap: int,
    max_dur: int,
    tiebreak: list[str] | None = None,
    out_col: str = "session_seq",
) -> DataFrame:
    """Tag every row with its 1-based session number within its key.

    ``ts_col`` integer event time; ``gap`` and ``max_dur`` in the same
    unit.  Output schema = input + ``out_col`` (long)."""
    order = list(keys) + [ts_col] + list(tiebreak or [])
    schema = StructType(df.schema.fields + [StructField(out_col, LongType())])
    parted = df.repartition(*[F.col(k) for k in keys]).sortWithinPartitions(
        *[F.col(c) for c in order]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        prev_key = None
        sid = 0
        prev = anchor = None
        for pdf in batches:
            ts = pdf[ts_col].to_numpy()
            key_cols = [pdf[k].to_numpy() for k in keys]
            seq = [0] * len(ts)
            for i in range(len(ts)):
                kt = tuple(c[i] for c in key_cols)
                if kt != prev_key:
                    prev_key = kt
                    sid = 0
                    prev = anchor = None
                t = int(ts[i])
                if prev is None or t - prev > gap or t - anchor > max_dur:
                    sid += 1
                    anchor = t
                prev = t
                seq[i] = sid
            pdf[out_col] = seq
            yield pdf

    return parted.mapInPandas(scan, schema)
