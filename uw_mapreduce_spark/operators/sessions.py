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

Scale: one hash shuffle on the key, Arrow-batched per-key O(n) pass,
bounded per-key cardinality — the debounce scale argument verbatim.
"""

from __future__ import annotations

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
    order = [ts_col] + list(tiebreak or [])
    schema = StructType(df.schema.fields + [StructField(out_col, LongType())])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        ts = pdf[ts_col].to_numpy()
        seq = [0] * len(ts)
        sid = 0
        prev = anchor = None
        for i, t in enumerate(ts):
            t = int(t)
            if prev is None or t - prev > gap or t - anchor > max_dur:
                sid += 1
                anchor = t
            prev = t
            seq[i] = sid
        pdf[out_col] = seq
        return pdf

    return df.groupBy(*[F.col(k) for k in keys]).applyInPandas(kernel, schema)
