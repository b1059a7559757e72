"""Range (point-in-interval) join — bucketized for scale.

Not in the reference (SURVEY.md §2.2 lists no joins at all); part of the
engine's time-series join surface next to ``asof_join``.

A naive point-in-interval join is a theta join: Spark plans
BroadcastNestedLoopJoin (fine when one side is tiny) or a cartesian
product (never fine).  The scale path is the standard binning scheme:

- pick a bucket width ``w`` comparable to the typical interval length,
- each LEFT point maps to exactly ONE bucket (``floor(point / w)``),
- each RIGHT interval explodes to the ~len/w + 1 buckets it overlaps,
- equi-join on the bucket id (plus any equality keys), then apply the
  exact containment predicate as the join residual.

Every qualifying (point, interval) pair meets in exactly one bucket —
the point's — so no post-join dedup is needed.  Cost is
|L| + |R|·(len/w + 1) join input rows instead of |L|·|R| comparisons;
hot buckets (many intervals over one time slice) are split by AQE's
skew-join handling.  ``width`` is an explicit caller choice (a pure
constant keeps the plan deterministic); tune it to the median interval
length — too small explodes the right side, too large degrades toward
the theta join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    width: int,
    on: list[str] | None = None,
    closed: str = "right",
) -> DataFrame:
    """Join each left row to the right intervals containing its point.

    ``point_col``/``start_col``/``end_col`` must be numeric (e.g. epoch
    micros — cast timestamps first).  ``on`` adds equality keys (both
    sides) to the bucket join.  ``closed`` picks the containment
    convention: "right" = (start, end], "left" = [start, end),
    "both" = [start, end].
    """
    if closed not in ("right", "left", "both"):
        raise ValueError("closed must be 'right', 'left', or 'both'")
    point = F.col(point_col)
    lo, hi = F.col(start_col), F.col(end_col)
    contains: Column = {
        "right": (point > lo) & (point <= hi),
        "left": (point >= lo) & (point < hi),
        "both": (point >= lo) & (point <= hi),
    }[closed]

    w = F.lit(int(width))
    l_side = left.withColumn("_bk", F.floor(point / w))
    r_side = right.withColumn(
        "_bk", F.explode(F.sequence(F.floor(lo / w), F.floor(hi / w)))
    )
    keys = ["_bk"] + list(on or [])
    return l_side.join(r_side, on=keys, how="inner").where(contains).drop("_bk")
