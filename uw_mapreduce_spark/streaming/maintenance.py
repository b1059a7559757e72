"""Streaming materialized-view maintenance via foreachBatch.

The production shape for keeping a 100 TB rollup fresh: a stream of
raw rows arrives in micro-batches; each batch is treated as a
+1-weighted changelog and folded into the running snapshot with
``operators/merge.incremental_rollup`` — so per batch the work is
O(|batch| keys), never a recompute of the base.  This is the
``foreachBatch`` pattern from the Structured Streaming guide with the
engine's own IVM operator as the merge step.

Here the snapshot lives as an eagerly-materialized (localCheckpoint)
frame swapped per batch — the test-friendly stand-in for the
production sink (a keyed table / Delta MERGE target); the batch-vs-
stream equality contract is what the pytest pins: a fully drained
stream's snapshot equals the one-shot batch aggregate of the same
input.

Retractions compose for free: feed rows with an explicit weight column
(e.g. CDC deletes as -1) through ``weight_col`` instead of the
constant +1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.merge import incremental_rollup


class RollupMaintainer:
    """Holds the running snapshot across micro-batches."""

    def __init__(self, key_cols: list[str], value_col: str,
                 weight_col: str | None = None):
        self.key_cols = key_cols
        self.value_col = value_col
        self.weight_col = weight_col
        self.snapshot: DataFrame | None = None
        self.batches_applied = 0

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.weight_col is None:
            chg = batch_df.select(
                *self.key_cols, self.value_col, F.lit(1).alias("weight")
            )
        else:
            chg = batch_df.select(
                *self.key_cols, self.value_col,
                F.col(self.weight_col).alias("weight"),
            )
        new_snap = incremental_rollup(
            self.snapshot, chg, self.key_cols, self.value_col
        ).localCheckpoint(eager=True)  # materialize: next batch must not
        # re-execute this batch's lineage (the source batch is gone).
        old = self.snapshot
        self.snapshot = new_snap
        self.batches_applied += 1
        del old


def maintain_rollup(stream_df: DataFrame, key_cols: list[str], value_col: str,
                    *, weight_col: str | None = None):
    """Start an availableNow maintenance query over ``stream_df``.

    Returns (query, maintainer) — await the query, then read
    ``maintainer.snapshot`` as the up-to-date rollup."""
    m = RollupMaintainer(key_cols, value_col, weight_col)
    q = (
        stream_df.writeStream.foreachBatch(m.apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    return q, m
