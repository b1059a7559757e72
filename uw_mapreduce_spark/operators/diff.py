"""Keyed table diff / reconciliation.

The migration-validation primitive: given two snapshots of a keyed
table (old pipeline vs new pipeline, yesterday vs today, source vs
replicated), classify every key as added / removed / changed /
unchanged.  This engine uses it on itself — rewrite a 100 TB table
with a new layout, then diff against the source to prove content
identity before the swap.

Plan: ONE full outer join on the key — both sides shuffle once (or
zero times if both are bucketed on the key); the value comparison
rides the join as an md5 over the canonicalized compare columns, so
wide rows compare by digest rather than column-by-column in the join
condition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_digest(cols: list[str]):
    """Order-stable digest of the compare columns.  NULL is encoded
    distinctly from the string 'NULL' and from empty (field markers
    survive concat), so NULL vs '' vs absent all differ."""
    parts = []
    for c in cols:
        parts.append(F.lit(f"\x01{c}\x02"))
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\x00")))
    return F.md5(F.concat(*parts))


def table_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
               compare_cols: list[str] | None = None,
               status_col: str = "diff_status") -> DataFrame:
    """Classify keys across two snapshots.

    Returns one row per key present in either side: key columns +
    ``status_col`` in {'added', 'removed', 'changed', 'unchanged'}.
    ``compare_cols`` defaults to all shared non-key columns.

    Contract: ``key_cols`` must uniquely identify a row on each side —
    duplicate keys would multiply through the full outer join.
    Deduplicate or aggregate first (`apply_changelog` compacts a
    multi-version table to latest-per-key)."""
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    o = old.select(*key_cols, _row_digest(compare_cols).alias("_od"))
    n = new.select(*key_cols, _row_digest(compare_cols).alias("_nd"))
    joined = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("_od").isNull(), F.lit("added"))
        .when(F.col("_nd").isNull(), F.lit("removed"))
        .when(F.col("_od") == F.col("_nd"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*key_cols, status.alias(status_col))
