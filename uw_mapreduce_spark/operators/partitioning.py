"""Range partitioning, in-partition sort, total sort, rank rebalance.

Reference parity:
- O6 range partition: `SortMapper` ships sampled borders to every mapper
  via the distributed cache and routes each record to the partition whose
  border interval contains its key
  (`/root/reference/src/SlidingAggregation.java:87-146`, border lookup
  `find_border` :128-134, ±∞ guard borders :109-111).
- O7 within-partition sort: `SortReducer` buffers the whole partition and
  sorts in memory (`SlidingAggregation.java:148-170`) — no spill, an
  O(partition) heap bomb at scale.  Spark's sort spills; strictly better.
- O11 perfect rebalance: `PerfectMapper` routes rank r to partition
  ⌊r/⌈n/P⌉⌋ so every partition holds an equal contiguous rank block
  (`SlidingAggregation.java:213-239`).

Spark-first: O6+O7 *is* `df.orderBy` (RangePartitioner samples borders
internally — the whole Sample job disappears), and O11 on a dense unique
rank *is* `repartitionByRange` because equi-depth equals equi-width.
These wrappers exist so each reference operator is individually callable
and testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def range_partition(df: DataFrame, cols: list[str | Column], num_partitions: int | None = None) -> DataFrame:
    """O4+O5+O6 in one call: sample, compute borders, shuffle by range.

    `repartitionByRange` runs a distributed reservoir sample and quantile
    computation (the reference's Sample job) inside the exchange —
    no single-reducer collect, no distributed-cache file.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    if num_partitions is None:
        return df.repartitionByRange(*cs)
    return df.repartitionByRange(num_partitions, *cs)


def sort_within_partitions(df: DataFrame, cols: list[str | Column]) -> DataFrame:
    """O7: sort inside each partition, no shuffle (spilling, unlike the
    reference's in-heap `Collections.sort`)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return df.sortWithinPartitions(*cs)


def total_sort(df: DataFrame, cols: list[str | Column], num_partitions: int | None = None) -> DataFrame:
    """O6+O7 fused = global total-order sort.

    Equivalent to the reference's Sample+Sort jobs
    (`SlidingAggregation.java:438-472`); Spark plans it as
    RangePartitioner exchange + per-partition spillable sort, with AQE
    coalescing output partitions at runtime.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    out = df.orderBy(*cs)
    if num_partitions is not None:
        out = df.repartitionByRange(num_partitions, *cs).sortWithinPartitions(*cs)
    return out


def rebalance_by_rank(df: DataFrame, rank_col: str = "rank", num_partitions: int | None = None) -> DataFrame:
    """O11: contiguous equal-size rank blocks per partition.

    On a dense 0..n-1 rank, range partitioning IS the reference's
    ⌊rank/m⌋ routing (`SlidingAggregation.java:234-237`) — equi-depth
    quantiles of a dense sequence are equi-width blocks.  Content is
    unchanged (a pure exchange), which is what makes it oracle-checkable
    as SELECT *.
    """
    return range_partition(df, [rank_col], num_partitions)
