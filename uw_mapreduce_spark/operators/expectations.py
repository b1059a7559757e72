"""Declarative data-quality expectation suite (Deequ-style), one pass.

Before a 100 TB delivery enters the training pipeline it has to clear a
contract: keys present and unique, values in range, categories in the
allowed set.  The naive implementation runs one job per constraint and
re-scans the table N times; Deequ's insight (and this operator's) is
that every row-level constraint is a conditional count and every
uniqueness constraint a distinct count, so the WHOLE suite folds into
ONE aggregation pass — the table crosses the wire once, the suite's
cost is independent of how many constraints it carries.

An expectation is ``Expectation(name, violation, unique_key)``:

- row-level: ``violation`` is a boolean Column that is TRUE on rows
  breaking the constraint; violations = conditional count (map-side
  partial agg, no extra scan),
- uniqueness: ``unique_key`` names a column; violations =
  count(*) − count(DISTINCT key) (Catalyst plans all distincts in the
  same pass via one Expand).

Output is long-format — one row per expectation:
``(expectation, n_rows, violations, passed)`` with ``passed`` =
(violations == 0), built by unpivoting the single aggregate row with a
literal struct array (map-only, same shape as ``profile_columns``).

Scale: one scan + one all-to-one aggregate whose width is
O(#expectations); the Expand for distinct counts multiplies shuffle
rows by (#unique constraints + 1) but carries only the grouping keys.
At 100 TB this is the audit you can actually afford to run per
delivery.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    violation: Column | None = None  # TRUE on rows breaking the constraint
    unique_key: str | None = None    # column whose values must be unique

    def __post_init__(self):
        if (self.violation is None) == (self.unique_key is None):
            raise ValueError(
                f"expectation {self.name!r}: exactly one of violation / "
                "unique_key must be given"
            )


def evaluate_expectations(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate the suite in one aggregation pass over ``df``."""
    aggs = [F.count(F.lit(1)).alias("__total")]
    for e in expectations:
        if e.violation is not None:
            aggs.append(
                F.sum(F.when(e.violation, F.lit(1)).otherwise(F.lit(0)))
                .cast("long")
                .alias(f"__v_{e.name}")
            )
        else:
            aggs.append(F.countDistinct(e.unique_key).alias(f"__v_{e.name}"))
    one = df.agg(*aggs)

    rows = F.array(
        *[
            F.struct(
                F.lit(e.name).alias("expectation"),
                F.col("__total").cast("long").alias("n_rows"),
                (
                    F.col(f"__v_{e.name}")
                    if e.violation is not None
                    else F.col("__total") - F.col(f"__v_{e.name}")
                )
                .cast("long")
                .alias("violations"),
            )
            for e in expectations
        ]
    )
    long = one.select(F.explode(rows).alias("r")).select("r.*")
    return long.withColumn("passed", F.col("violations") == F.lit(0))
