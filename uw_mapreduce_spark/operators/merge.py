"""Changelog application (CDC merge / upsert-with-tombstones).

The maintenance operation every long-lived training corpus needs:
a base snapshot plus a stream of keyed changes (upserts and deletes),
compacted to the new snapshot where the LATEST change per key wins and
tombstoned keys disappear.  The same shape serves SCD-type-1 dimension
maintenance, crawl re-visits overwriting stale documents, and takedown
processing (delete = the legally-important case).

Spark-first plan: union the two sides and resolve winners with one
window over the key — a single hash shuffle on the key, partial
aggregation not applicable but the window needs no global order (each
key sorts locally within its partition).  At 100 TB the snapshot is the
big side: store it bucketed by the key and only the (much smaller)
changelog shuffles; the union + window then co-locate for free.  No
analogue in the reference (file:lineage — mikolajblaz/uw-mapreduce has
no mutation surface); semantics follow the standard MERGE INTO
latest-wins contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def apply_changelog(
    snapshot: DataFrame | None,
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Compact ``snapshot`` + ``changes`` into the post-merge snapshot.

    ``changes`` carries ``op_col`` ('U' upsert / ``delete_op`` tombstone)
    and ``seq_cols`` (a total order within each key — e.g. (ts,
    event_id); ties are a data bug, not resolved here).  Any change
    outranks the snapshot row for its key; among changes the highest
    ``seq_cols`` wins; a winning tombstone removes the key entirely.

    Output: the value columns of ``changes`` minus ``op_col``, with
    snapshot-origin rows carrying NULL ``seq_cols``.  Pass
    ``snapshot=None`` for pure changelog compaction.
    """
    chg = changes.withColumn("_src", F.lit(1))
    if snapshot is not None:
        snap = snapshot.withColumn("_src", F.lit(0)).withColumn(
            op_col, F.lit("U")
        )
        for c in seq_cols:
            snap = snap.withColumn(c, F.lit(None).cast(chg.schema[c].dataType))
        unioned = snap.unionByName(chg.select(*snap.columns))
    else:
        unioned = chg
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("_src").desc(), *[F.col(c).desc() for c in seq_cols]
    )
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col(op_col) != F.lit(delete_op)))
        .drop("_rn", "_src", op_col)
    )


def incremental_rollup(snapshot: DataFrame | None, changelog: DataFrame,
                       key_cols: list[str], value_col: str,
                       weight_col: str = "weight") -> DataFrame:
    """Incremental view maintenance for count/sum rollups: apply a
    weighted changelog (+1 insert / -1 retraction per row) to a
    previous aggregate snapshot WITHOUT recomputing the base.

    ``snapshot`` holds (key_cols..., n, sum_v) from the previous run
    (None for a cold start); ``changelog`` holds raw rows
    (key_cols..., value_col, weight_col).  Output is the new
    (key_cols..., n, sum_v), with groups whose count reaches zero
    dropped — exactly equal to re-aggregating the fully-updated base
    (the pytest + driver oracle both assert that equality).

    Scale: this is THE argument for incremental pipelines — the
    changelog aggregates down to its own key set before the merge, so
    the shuffle is O(|delta| keys), not O(|base|); with the snapshot
    stored bucketed by key, only the delta moves.  Count and sum are
    the self-maintainable aggregates (min/max are NOT maintainable
    under retraction without keeping per-key state — use
    ``apply_changelog`` + re-aggregation for those)."""
    delta = changelog.groupBy(*key_cols).agg(
        F.sum(weight_col).cast("long").alias("n"),
        F.sum(F.col(weight_col) * F.col(value_col)).cast("long").alias("sum_v"),
    )
    parts = delta if snapshot is None else snapshot.select(
        *key_cols, F.col("n").cast("long"), F.col("sum_v").cast("long")
    ).unionByName(delta)
    return (
        parts.groupBy(*key_cols)
        .agg(F.sum("n").cast("long").alias("n"), F.sum("sum_v").cast("long").alias("sum_v"))
        .where(F.col("n") > 0)
    )


def scd2_intervals(changes: DataFrame, key_cols: list[str],
                   order_cols: list[str], ts_col: str | None = None) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a keyed change stream
    into validity intervals — each change row becomes a version valid
    from its own timestamp until the key's NEXT change
    (valid_to = NULL ⇒ current version).

    ``order_cols`` must totally order each key's changes (timestamp
    plus a unique tiebreak); ``ts_col`` (default: the first order
    column) supplies the interval bounds.  The warehouse-maintenance
    complement of ``apply_changelog`` (which keeps only the latest
    winner): SCD2 keeps EVERY version queryable — "what did this row
    say at time T" becomes a point-in-interval lookup
    (`operators/rangejoin.range_join`).  One window over the key: a
    single shuffle, O(1) state per row."""
    ts_col = ts_col or order_cols[0]
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
