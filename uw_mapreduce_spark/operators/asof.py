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
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_value_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join.

    ``right_value_cols`` (default: all right columns except key and ts)
    appear in the output as ``<col><suffix>``, plus ``<ts_col><suffix>``
    — NULL where no right row matches.

    ``direction``: 'backward' (default) matches the most recent right
    row at-or-before the left row (``l.ts >= r.ts``); 'forward'
    matches the EARLIEST right row at-or-after it (``l.ts <= r.ts`` —
    pandas merge_asof's forward direction).  Forward is the same
    carry-forward plan run over descending time: same single shuffle,
    same O(1) state.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if right_value_cols is None:
        right_value_cols = [c for c in right.columns if c not in (on, ts_col)]
    left_types = dict(left.dtypes)
    carry_src = right_value_cols + [ts_col]
    carry_dst = [f"{c}{suffix}" for c in carry_src]

    # All carried columns travel as ONE struct so a single
    # last(ignorenulls) picks every value from the same matched right row
    # (per-column last() would mix rows when a carried value is NULL).
    r_fields = {f.name: f.dataType for f in right.schema.fields}
    carry_type = StructType(
        [StructField(dst, r_fields[src], True) for src, dst in zip(carry_src, carry_dst)]
    )

    l_side = left.withColumn("_tag", F.lit(1)).withColumn(
        "_carry", F.lit(None).cast(carry_type)
    )

    r_side = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_tag"),
        F.struct(
            *[F.col(src).alias(dst) for src, dst in zip(carry_src, carry_dst)]
        ).alias("_carry"),
    )
    for c in left.columns:
        if c not in (on, ts_col):
            r_side = r_side.withColumn(c, F.lit(None).cast(left_types[c]))

    unioned = l_side.unionByName(r_side)
    # Right rows order before left at equal ts in both directions (tag
    # ascending), keeping the join inclusive.
    ts_order = F.col(ts_col) if direction == "backward" else F.col(ts_col).desc()
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("_tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned.withColumn("_carry", F.last("_carry", ignorenulls=True).over(w))
    for dst in carry_dst:
        out = out.withColumn(dst, F.col("_carry").getField(dst))
    return out.where(F.col("_tag") == 1).drop("_tag", "_carry")
