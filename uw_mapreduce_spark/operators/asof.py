"""As-of join: for each left row, the most recent right row at or before
it, per key.

Not in the reference (SURVEY.md §2.2 — no joins at all); a standard
time-series operator the engine surface needs.  Implemented as the
union + last-value-carry-forward pattern rather than a range join:

    union(right tagged 0, left tagged 1)
      -> window PARTITION BY key ORDER BY (ts, tag)
      -> last(right payload, ignorenulls) over unbounded-preceding..current
      -> keep left rows

Cost: ONE shuffle of |L|+|R| rows on the key (same as any join), window
evaluation is per-key sequential — this scales with the number of keys,
never materializes L×R candidate pairs, and needs no range-join binning.
Right rows tag 0 so an exactly-equal timestamp is visible to the left
row (inclusive as-of, matching `ASOF JOIN ... ON l.ts >= r.ts`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join.

    ``right_value_cols`` (default: all right columns except key and ts)
    appear in the output as ``<col><suffix>``, plus ``<ts_col><suffix>``
    — NULL where no right row is at-or-before the left row.
    """
    if right_value_cols is None:
        right_value_cols = [c for c in right.columns if c not in (on, ts_col)]
    right_types = dict(right.dtypes)
    left_types = dict(left.dtypes)
    carry_src = right_value_cols + [ts_col]
    carry_dst = [f"{c}{suffix}" for c in carry_src]

    l_side = left.withColumn("_tag", F.lit(1))
    for src, dst in zip(carry_src, carry_dst):
        l_side = l_side.withColumn(dst, F.lit(None).cast(right_types[src]))

    r_side = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_tag"),
        *[F.col(src).alias(dst) for src, dst in zip(carry_src, carry_dst)],
    )
    for c in left.columns:
        if c not in (on, ts_col):
            r_side = r_side.withColumn(c, F.lit(None).cast(left_types[c]))

    unioned = l_side.unionByName(r_side)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col), F.col("_tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned
    for dst in carry_dst:
        out = out.withColumn(dst, F.last(dst, ignorenulls=True).over(w))
    return out.where(F.col("_tag") == 1).drop("_tag")
