"""Interval coalescing (gaps-and-islands): merge overlapping or
touching intervals per key into maximal disjoint islands.

The shape behind downtime stitching, ad-exposure windows, IP-lease
consolidation, and coverage analysis: given (key, start, end) rows,
produce each key's maximal merged spans plus how many raw intervals
folded into each.

Spark-first plan — the classic two-window formulation, NOT a self
join: order each key's intervals by start; an interval begins a new
island exactly when its start exceeds the running max end of all
earlier intervals; a running sum over those begin-markers numbers the
islands; one aggregate per (key, island) finishes.  One shuffle + one
sort per key, O(1) state per row — at 100 TB the alternative
(interval × interval overlap join) is quadratic in hot keys, this is
linear.  Bounds must be integral (epoch micros, not timestamps) so
the cross-engine comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def coalesce_intervals(df: DataFrame, key_cols: list[str], start_col: str,
                       end_col: str, *, touch_merges: bool = True) -> DataFrame:
    """Merge per-key intervals into islands.

    Returns (key_cols..., island_id, island_start, island_end,
    n_merged).  ``touch_merges``: whether [1, 5] and [5, 9] fuse (end ==
    next start) or stay separate."""
    order = [start_col, end_col] + key_cols  # total order: deterministic islands
    w_prev = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max_end = F.max(end_col).over(w_prev)
    gap = (
        F.col(start_col) > prev_max_end
        if touch_merges
        else F.col(start_col) >= prev_max_end
    )
    marked = df.withColumn(
        "_new_island",
        F.when(prev_max_end.isNull() | gap, F.lit(1)).otherwise(F.lit(0)),
    )
    w_run = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = marked.withColumn(
        "island_id", F.sum("_new_island").over(w_run).cast("long")
    )
    return numbered.groupBy(*key_cols, "island_id").agg(
        F.min(start_col).alias("island_start"),
        F.max(end_col).alias("island_end"),
        F.count(F.lit(1)).alias("n_merged"),
    )
