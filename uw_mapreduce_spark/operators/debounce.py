"""Debounce / throttle: greedy min-gap event suppression per key.

The event-pipeline primitive behind "at most one notification per user
per hour", double-click suppression, and sensor-reading thinning: scan
each key's events in time order and KEEP a row only if at least
``gap`` has elapsed since the last KEPT row (the first row is always
kept).  This is NOT expressible as a window function — whether row i
survives depends on which of rows 1..i-1 survived (a greedy chain), so
``lag`` over raw timestamps computes a different (wrong) answer
whenever two drops are chained.

Like the CUSUM kernel (`streaming/drift.py`), every step is integer
arithmetic on O(1) state per key, so the whole fold is deterministic
and a DuckDB recursive CTE can replay it exactly — this operator has a
full value-hash oracle despite being sequential.

Scale shape (100 TB): one hash shuffle on the key columns, then an
Arrow-batched `applyInPandas` whose per-group work is a single O(n)
pass over a numpy int64 array.  Per-key event counts are bounded (a
user's events, a sensor's readings), so no group outgrows a task; the
output adds one boolean column and never reshuffles.

Reference parity: extends the reference's per-partition sequential
scan idea (SlidingAggregation.java's in-partition pass) to keyed
greedy state, which its fixed-window model cannot express.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

__all__ = ["debounce"]


def debounce(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    gap: int,
    tiebreak: list[str] | None = None,
    out_col: str = "kept",
) -> DataFrame:
    """Tag every row with whether it survives min-gap suppression.

    ``ts_col`` must be an integer column (e.g. epoch microseconds);
    ``gap`` is in the same unit.  Rows are ordered by (ts_col,
    *tiebreak) within each key; a row is kept iff
    ``ts - ts_of_last_kept >= gap`` (first row always kept).  Output
    schema = input schema + ``out_col`` boolean; row set unchanged, so
    downstream can either filter kept rows or audit the drop rate.
    """
    order = [ts_col] + list(tiebreak or [])
    schema = StructType(df.schema.fields + [StructField(out_col, BooleanType())])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        ts = pdf[ts_col].to_numpy()
        kept = [False] * len(ts)
        last = None
        for i, t in enumerate(ts):
            t = int(t)
            if last is None or t - last >= gap:
                kept[i] = True
                last = t
        pdf[out_col] = kept
        return pdf

    return df.groupBy(*[F.col(k) for k in keys]).applyInPandas(kernel, schema)
