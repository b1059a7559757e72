"""Schema-enforced CSV/JSON ingestion with corrupt-record quarantine.

At 100 TB, some fraction of any external delivery is malformed —
truncated lines, wrong arity, unparseable numbers.  FAILFAST kills the
job on row one; DROPMALFORMED silently loses data.  The production
middle road is PERMISSIVE parsing with the raw text of every bad row
captured in a quarantine column, split into (good rows, quarantined
raw lines + why) so the pipeline proceeds while the bad rows stay
auditable and replayable.

Spark-side mechanics worth knowing (encoded here so callers don't
re-learn them): the `_corrupt_record` column must be part of the read
schema; a malformed row yields nulls in every data column plus the raw
text in the corrupt column; and Spark refuses to FILTER on the corrupt
column alone without a cache/materialization barrier — this module
routes around that by splitting on `IS NULL` over a cached frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"


def read_csv_quarantine(spark: SparkSession, path: str, schema: StructType, *,
                        header: bool = False, sep: str = ",",
                        **options) -> tuple[DataFrame, DataFrame]:
    """Read CSV under ``schema``; return (good, quarantine).

    ``good`` has exactly the schema's columns, only fully-parsed rows.
    ``quarantine`` is (raw_line) — every malformed input line verbatim,
    ready to land in a quarantine table for replay after the upstream
    fix."""
    full = schema.add(CORRUPT_COL, StringType(), True)
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", header)
        .option("sep", sep)
        .options(**{k: str(v) for k, v in options.items()})
        .csv(path)
    )
    # Spark disallows filtering on the corrupt column over the raw
    # relation (SPARK-21610); a cache barrier makes the split legal.
    df = df.cache()
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad


def read_binary_dir(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Ingest a directory of opaque media files via Spark's built-in
    ``binaryFile`` source — the entry point that turns an image/audio
    dump into the engine's media frame (`functions/multimodal.
    attach_media` downstream).

    Columns: (path, mod_time, n_bytes, payload).  ``glob`` filters by
    pathname pattern (pushed to the source via pathGlobFilter, so
    non-matching files are never opened); ``max_bytes`` guards the
    executor heap against oversized blobs — the FILTER is on the
    source's length metadata column, so oversized payloads are pruned
    at scan time, not after materializing their bytes.

    Scale notes: binaryFile caps per-file size at
    ``spark.sql.sources.binaryFile.maxLength`` (int32 max) and packs
    many small files per task via the usual maxPartitionBytes packing —
    the right source for millions of small media objects; shard
    archives (tar/UWV1 containers) are better for billions."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path).select(
        F.col("path"),
        F.col("modificationTime").alias("mod_time"),
        F.col("length").cast("long").alias("n_bytes"),
        F.col("content").alias("payload"),
    )
    if max_bytes is not None:
        df = df.where(F.col("n_bytes") <= max_bytes)
    return df
