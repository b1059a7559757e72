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

Scale shape (100 TB): ONE hash repartition on the key columns + an
in-partition secondary sort (keys, ts, tiebreak), then a partition-
level Arrow `mapInPandas` pass — one Python invocation per PARTITION,
not per key (a per-group `applyInPandas` pays ~1 ms of Arrow/pandas
overhead per key — measured 11 s for 7.5 k keys at sf0.1, vs a single
O(rows) scan per partition here).  Group boundaries and the
last-kept state carry across Arrow record batches, so batch splitting
inside a group is transparent.  Per-key event counts are bounded, the
output adds one boolean column and never reshuffles.

Reference parity: extends the reference's per-partition sequential
scan idea (SlidingAggregation.java's in-partition pass) to keyed
greedy state, which its fixed-window model cannot express.
"""

from __future__ import annotations

from typing import Iterator

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
    order = list(keys) + [ts_col] + list(tiebreak or [])
    schema = StructType(df.schema.fields + [StructField(out_col, BooleanType())])
    parted = df.repartition(*[F.col(k) for k in keys]).sortWithinPartitions(
        *[F.col(c) for c in order]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        prev_key = None
        last: int | None = None
        for pdf in batches:
            ts = pdf[ts_col].to_numpy()
            key_cols = [pdf[k].to_numpy() for k in keys]
            kept = [False] * len(ts)
            for i in range(len(ts)):
                kt = tuple(c[i] for c in key_cols)
                if kt != prev_key:
                    prev_key = kt
                    last = None
                t = int(ts[i])
                if last is None or t - last >= gap:
                    kept[i] = True
                    last = t
            pdf[out_col] = kept
            yield pdf

    return parted.mapInPandas(scan, schema)
