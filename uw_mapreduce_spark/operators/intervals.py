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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    start_col: str = "t0_us",
    end_col: str = "t1_us",
    bucket_us: int = 3_600_000_000,
    extra_pred=None,
) -> DataFrame:
    """Interval × interval OVERLAP join, bucketized — never cartesian.

    ``range_join`` handles point-in-interval; this is the two-sided
    case (concurrent sessions, conflicting reservations, co-occurring
    incidents): every (left, right) pair whose [start, end] spans
    intersect.  Catalyst would execute the raw inequality predicate as
    BroadcastNestedLoopJoin — quadratic and undistributable.  Instead
    both sides explode to the time buckets their interval covers and
    equi-join on the bucket, so shuffle + candidate cost is governed by
    per-bucket occupancy (pick ``bucket_us`` near the typical interval
    length; concurrency itself, not corpus size, bounds the output).

    De-dup without a distinct shuffle: a pair whose intervals overlap
    shares every bucket in the overlap region; it is emitted ONLY in
    the bucket containing max(start_l, start_r) — the first overlap
    bucket, which both sides provably cover — so each true pair
    surfaces exactly once and no post-join dedup pass exists.

    Bounds must be integral epoch micros (cross-engine exactness).
    Columns from both sides survive prefixed ``l_`` / ``r_``; the
    output adds ``overlap_us`` = min(end)−max(start) ≥ 0.
    """
    w = int(bucket_us)

    def fdiv(expr_sql: str) -> F.Column:
        # Exact int64 floor division (the dbscan_grid idiom,
        # clustering.py): F.floor(s / w) routes through double and can
        # misbucket once |s| > 2^53; the pmod shift makes trunc-DIV a
        # true floor for negative epochs too.
        return F.expr(
            f"CAST((({expr_sql}) - ((({expr_sql}) % {w} + {w}) % {w}))"
            f" DIV {w} AS BIGINT)"
        )

    def prep(df: DataFrame, p: str) -> DataFrame:
        renamed = df.select([F.col(c).alias(f"{p}{c}") for c in df.columns])
        return renamed.withColumn(
            "__bucket",
            F.explode(
                F.sequence(fdiv(f"`{p}{start_col}`"), fdiv(f"`{p}{end_col}`"))
            ),
        )

    a, b = prep(left, "l_"), prep(right, "r_")
    ls, le = F.col(f"l_{start_col}"), F.col(f"l_{end_col}")
    rs, re_ = F.col(f"r_{start_col}"), F.col(f"r_{end_col}")
    first_overlap_bucket = fdiv(f"greatest(`l_{start_col}`, `r_{start_col}`)")
    cond = (
        (a["__bucket"] == b["__bucket"])
        & (ls <= re_)
        & (rs <= le)
        & (a["__bucket"] == first_overlap_bucket)
    )
    out = a.join(b, cond).drop("__bucket")
    if extra_pred is not None:
        out = out.where(extra_pred)
    return out.withColumn(
        "overlap_us", (F.least(le, re_) - F.greatest(ls, rs)).cast("long")
    )
