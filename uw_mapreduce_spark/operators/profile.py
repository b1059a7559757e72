"""One-pass column profiling ("ANALYZE TABLE" as an operator).

Data-quality triage over a new 100 TB delivery starts with per-column
null counts, cardinalities, and ranges.  This computes them for any
column list in ONE aggregation pass — no per-column jobs, no driver
loop: Spark plans the multiple count-distincts with a single Expand +
partial aggregation, so the table is read once.

Output is long-format (col_name, n_rows, n_null, n_distinct, min_repr,
max_repr) — one row per profiled column — built by unpivoting the
single aggregate row with a literal struct array (map-only).

Cross-engine caution baked into the API: min/max are reported as
STRING-CAST values, so callers who need hash-stable output should
pre-project columns to integer/string types (the catalog query casts
money to cents first) — raw doubles' string forms are not portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__total").cast("long").alias("n_rows"),
                (F.col("__total") - F.col(f"__nn_{c}")).cast("long").alias("n_null"),
                F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_repr"),
                F.col(f"__mx_{c}").alias("max_repr"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")
