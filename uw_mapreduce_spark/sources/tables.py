"""Parquet table loaders for the driver's TPC-H-ish star schema.

The reference reads only tab-text (`SlidingAggregation.java:446`); a real
engine is Parquet-first — columnar scans, predicate pushdown, column
pruning, partition pruning all come free from the Parquet source.

One driver-data quirk handled here: ``events.parquet`` stores ``ts`` as
parquet TIMESTAMP(NANOS), which Spark's reader rejects.  With
``spark.sql.legacy.parquet.nanosAsLong=true`` (set in session.py) the
column arrives as int64 nanoseconds; we convert to a proper timestamp by
truncating to microseconds — identical to what DuckDB does when reading
the same file (its TIMESTAMP is µs), so oracle comparisons agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table; normalizes the events ns-timestamp."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    ts_type = dict(df.dtypes).get("ts")
    if name == "events" and ts_type == "bigint":
        # int64 ns -> µs -> TimestampType.  Integer DIV, not `/`: epoch-ns
        # (~1.7e18) exceeds double's 2^53 integer range, so float division
        # would be off by ±1 µs.  Truncating DIV matches DuckDB's ns->µs.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif name == "events" and ts_type == "timestamp_ntz":
        # Newer driver data writes naive µs timestamps.  Normalize to
        # TimestampType (session zone is pinned to UTC, so the cast is
        # wall-clock-identical) so every downstream consumer — event-time
        # watermarks require TimestampType — sees one ts type.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view so ``spark.sql`` queries run."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
