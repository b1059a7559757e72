"""Table diff / reconciliation: compare two keyed snapshots.

The data-reconciliation primitive behind migration sign-off ("does the
new pipeline produce the same table?"), CDC validation, and vendor-feed
audits: a key-aligned comparison of two frames classifying every key as
``added`` (right only), ``removed`` (left only), ``changed`` (present
in both, at least one compared column differs) or ``unchanged``, with
null-safe per-column change flags.

Scale shape (100 TB): ONE full-outer sort-merge join on the key
columns — both sides shuffle exactly once on the same key, which is the
minimum possible data motion for a full reconciliation; the per-column
comparison is a map-side projection over the joined rows and the
summary is a map-side partial aggregate over a handful of status
strings.  No collects, no windows.

Reference parity: the reference engine has no multi-table surface;
this extends its join/aggregation categories (SURVEY.md §2.2) with the
reconciliation workload an operational lakehouse needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["table_diff", "diff_summary"]


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff: (keys..., status, changed_<col>... , l_<col>/r_<col>...).

    ``status`` ∈ added / removed / changed / unchanged.  Column
    comparison is null-safe (`eqNullSafe`): NULL == NULL counts as
    unchanged, NULL vs value counts as changed.  Key columns must be
    unique per side (snapshot semantics)."""
    l = left.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"l_{c}") for c in compare_cols],
        F.lit(True).alias("_in_l"),
    )
    r = right.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"r_{c}") for c in compare_cols],
        F.lit(True).alias("_in_r"),
    )
    j = l.join(r, on=keys, how="full_outer")
    changed_flags = [
        (~F.col(f"l_{c}").eqNullSafe(F.col(f"r_{c}"))).alias(f"changed_{c}")
        for c in compare_cols
    ]
    any_changed = None
    for c in compare_cols:
        flag = ~F.col(f"l_{c}").eqNullSafe(F.col(f"r_{c}"))
        any_changed = flag if any_changed is None else (any_changed | flag)
    status = (
        F.when(F.col("_in_l").isNull(), F.lit("added"))
        .when(F.col("_in_r").isNull(), F.lit("removed"))
        .when(any_changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.withColumn("status", status)
    for c in compare_cols:
        out = out.withColumn(
            f"changed_{c}",
            F.when(F.col("status") == "changed",
                   ~F.col(f"l_{c}").eqNullSafe(F.col(f"r_{c}"))).otherwise(F.lit(False)),
        )
    return out.drop("_in_l", "_in_r")


def diff_summary(diff: DataFrame, compare_cols: list[str]) -> DataFrame:
    """Audit rollup of a `table_diff` frame: one row per status plus
    one ``col:<name>`` row per compared column counting keys where that
    specific column changed — the fixed-size artifact a reconciliation
    dashboard stores, independent of table size."""
    by_status = diff.groupBy(F.col("status").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )
    per_col = [
        diff.where(F.col(f"changed_{c}"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit(f"col:{c}").alias("bucket"), "n")
        for c in compare_cols
    ]
    out = by_status
    for p in per_col:
        out = out.unionByName(p)
    return out
