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
    """Holds the running snapshot across micro-batches.

    With ``snapshot_path`` the snapshot is DURABLE: loaded from parquet
    on construction (resume) and swapped to disk after each batch via
    write-to-temp + two renames (path -> .__old__, tmp -> path).  Each
    rename is atomic so no state is ever lost, but a crash between the
    renames leaves the path briefly absent — recovery is renaming
    .__old__ back (the stream's checkpoint makes the re-run of that
    batch idempotent anyway).  Paired with the
    stream's checkpointLocation, the pipeline restarts exactly where it
    stopped: the source replays only unseen files and the rollup
    continues from the persisted state — the full production
    maintenance contract, minus only a transactional table format."""

    def __init__(self, key_cols: list[str], value_col: str,
                 weight_col: str | None = None,
                 snapshot_path: str | None = None, spark=None):
        self.key_cols = key_cols
        self.value_col = value_col
        self.weight_col = weight_col
        self.snapshot_path = snapshot_path
        self.snapshot: DataFrame | None = None
        self.batches_applied = 0
        if snapshot_path is not None:
            import os

            if os.path.isdir(snapshot_path) and spark is not None:
                self.snapshot = spark.read.parquet(snapshot_path)

    def _persist(self, snap: DataFrame) -> DataFrame:
        import os
        import shutil

        tmp = self.snapshot_path.rstrip("/") + ".__tmp__"
        snap.write.mode("overwrite").parquet(tmp)
        old = self.snapshot_path.rstrip("/") + ".__old__"
        if os.path.isdir(self.snapshot_path):
            os.rename(self.snapshot_path, old)
        os.rename(tmp, self.snapshot_path)
        shutil.rmtree(old, ignore_errors=True)
        return snap.sparkSession.read.parquet(self.snapshot_path)

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
        new_snap = incremental_rollup(self.snapshot, chg, self.key_cols, self.value_col)
        if self.snapshot_path is not None:
            # Durable: the parquet swap is the materialization barrier.
            new_snap = self._persist(new_snap)
        else:
            # In-memory: localCheckpoint so the next batch never
            # re-executes this batch's lineage (the source batch is gone).
            new_snap = new_snap.localCheckpoint(eager=True)
        old = self.snapshot
        self.snapshot = new_snap
        self.batches_applied += 1
        del old


def maintain_rollup(stream_df: DataFrame, key_cols: list[str], value_col: str,
                    *, weight_col: str | None = None,
                    snapshot_path: str | None = None,
                    checkpoint_dir: str | None = None):
    """Start an availableNow maintenance query over ``stream_df``.

    Returns (query, maintainer) — await the query, then read
    ``maintainer.snapshot`` as the up-to-date rollup.  Pass
    ``snapshot_path`` + ``checkpoint_dir`` for the durable, restartable
    form (see RollupMaintainer)."""
    m = RollupMaintainer(
        key_cols, value_col, weight_col,
        snapshot_path=snapshot_path, spark=stream_df.sparkSession,
    )
    w = stream_df.writeStream.foreachBatch(m.apply_batch).trigger(availableNow=True)
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w.start(), m
