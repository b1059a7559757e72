"""Sampling + equi-depth quantile borders.

Reference parity:
- O4 Bernoulli sample: `SampleMapper` keeps each record with probability
  ``my.threshold`` via an unseeded coin flip
  (`/root/reference/src/SlidingAggregation.java:38-55`).  We expose the
  same filter but SEEDED — the reference's nondeterminism never affects
  answers (SURVEY.md §2.3.7), and determinism is what lets tests exist.
- O5 quantile borders: `SampleReducer` collects the whole sample on ONE
  reducer, sorts in memory, and emits the P-1 equi-depth quantiles
  (`SlidingAggregation.java:57-84`, `chooseBorders` :75-83, forced single
  reducer :444).  That single-reducer collect is the reference's
  scalability bug; Spark's `RangePartitioner` (inside `repartitionByRange`
  / `orderBy`) does the same job with a distributed reservoir sample, so
  the *engine* never calls this — it exists as a queryable operator for
  parity and for explicit-border workflows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def bernoulli_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """O4: keep each row independently with probability ``fraction``."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def equi_depth_borders(df: DataFrame, col: str, num_partitions: int) -> DataFrame:
    """O5: the P-1 equi-depth partition borders of ``col``.

    Border semantics mirror `chooseBorders` (`SlidingAggregation.java:75-83`):
    with s sorted sample values and P partitions, border i (1-based) is the
    sample element at 0-based index ``floor((i * s) / P) - 1`` clamped to
    >= 0 — i.e. the largest value of the i-th equi-depth bucket.  Exact
    (no sampling) so it is DuckDB-oracle-checkable; production code uses
    `repartitionByRange`, which samples internally.

    No single-partition stage: positions come from ``global_rank_scalable``
    (range-partitioned two-pass prefix count, O(n/P) per task) plus one
    scalar ``count()``; the P-1 target positions broadcast-join against
    the ranked frame.  Ties take arbitrary ranks, but every row in a run
    of equal values carries the same value, so the border VALUE at a
    position is deterministic.

    Returns (border_idx long, border <col-type>).
    """
    from .rank import global_rank_scalable

    spark = df.sparkSession
    vals = df.select(F.col(col).alias("border"))
    n = vals.count()
    if num_partitions <= 1 or n == 0:
        # StructType.add mutates in place — build a fresh schema so the
        # cached vals.schema is never corrupted.
        schema = T.StructType(
            list(vals.schema.fields) + [T.StructField("border_idx", T.LongType())]
        )
        return spark.createDataFrame([], schema).select("border_idx", "border")
    ranked = global_rank_scalable(vals, ["border"], rank_col="_rn")
    targets = [
        (i, max((i * n) // num_partitions, 1) - 1) for i in range(1, num_partitions)
    ]
    tdf = spark.createDataFrame(targets, "border_idx long, _rn long")
    return ranked.join(F.broadcast(tdf), "_rn").select("border_idx", "border")
