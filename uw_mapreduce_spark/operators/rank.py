"""Global 0-based rank over a total order.

Reference parity: O8+O9 — `SortReducer` forwards per-partition counts to
all later reducers as in-band sentinels (`/root/reference/src/
SlidingAggregation.java:159-168`), `RankReducer` accumulates them into a
prefix count and numbers its records in sorted order
(`SlidingAggregation.java:173-210`).  Rank is 0-based (:199) and the
reference's tie order is nondeterministic (`PairInt.java:58-60` compares
the key only); we require a full tiebreak column list instead
(SURVEY.md §2.3.1).

Two implementations:

- ``global_rank`` — ``row_number() OVER (ORDER BY ...) - 1``.  Catalyst
  plans an unpartitioned window, which collapses to ONE partition: fine
  up to ~10M rows, wrong at 100 TB.
- ``global_rank_scalable`` — the reference's own two-pass prefix-count
  algorithm, which is exactly what ``RDD.zipWithIndex`` implements:
  pass 1 counts records per (range-partitioned, sorted) partition,
  pass 2 numbers records with broadcast prefix offsets.  O(n/P) memory
  per task, no single-partition bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def global_rank(
    df: DataFrame,
    order_by: list[str],
    rank_col: str = "rank",
) -> DataFrame:
    """0-based dense global rank via the Window API (moderate scale)."""
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(rank_col, (F.row_number().over(w) - F.lit(1)).cast("long"))


def global_rank_scalable(
    df: DataFrame,
    order_by: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """0-based global rank with no single-partition stage (100 TB path).

    Plan: range-partition + sort by ``order_by`` (Spark's sampled
    RangePartitioner ≈ reference Sample+Sort jobs), then zipWithIndex's
    two passes (count-per-partition ≈ O8 sentinels, prefix offsets ≈ O9).
    The DataFrame->RDD->DataFrame hop loses whole-stage codegen for this
    one operator but keeps every partition O(n/P).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sorted_df = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order_by])
        .sortWithinPartitions(*[F.col(c) for c in order_by])
    )
    schema = StructType(sorted_df.schema.fields + [StructField(rank_col, LongType(), False)])
    indexed = sorted_df.rdd.zipWithIndex().map(lambda pair: (*pair[0], pair[1]))
    return spark.createDataFrame(indexed, schema)
