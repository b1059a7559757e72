"""Rolling z-score outlier detection in exact integer arithmetic.

Flags points that deviate more than k sigma from their own trailing
history — the standard streaming-metrics anomaly gate — WITHOUT ever
computing a mean, a variance, or a square root in floating point.
The test (x − μ)² > k²·σ² over a trailing window of n points
cross-multiplies into

    (n·x − Σ)²  >  k² · (n·Σx² − Σ²)

— all integers when x is a scaled integer, so Spark and DuckDB agree
bit-for-bit and the driver's value-hash oracle checks the detector
end-to-end (engines' floating σ implementations would not).

Plan: one shuffle on the partition key; the three window sums share
one sort; everything else is map-only.  Overflow bound: with
|x| ≤ X and window n, the dominant term is k²·n·Σx² ≤ k²·n²·X² —
callers pick the integer scale so that stays under 2^63 (the catalog
query uses milli-units: X ≈ 5·10^5, n = 20, k = 3 → ~9·10^14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_zscore_anomalies(df: DataFrame, key_cols: list[str],
                             order_cols: list[str], value_col: str, *,
                             window: int = 20, k: int = 3,
                             min_history: int = 10) -> DataFrame:
    """Rows whose value deviates > k sigma from the trailing ``window``
    rows of their key's history (current row excluded — the point is
    judged against its PAST, so one outlier cannot mask itself).
    Rows with fewer than ``min_history`` predecessors are never
    flagged.  ``value_col`` must be integral and pre-scaled."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(-window, -1)
    )
    x = F.col(value_col)
    n = F.count(value_col).over(w)
    s = F.sum(value_col).over(w)
    ss = F.sum(x * x).over(w)
    dev = n * x - s
    var_n = n * ss - s * s  # n²·variance of the history
    return (
        df.withColumn("_n", n)
        .withColumn("_dev", dev)
        .withColumn("_varn", var_n)
        .where((F.col("_n") >= min_history)
               & (F.col("_dev") * F.col("_dev") > F.lit(k * k) * F.col("_varn")))
        .drop("_n", "_dev", "_varn")
    )
