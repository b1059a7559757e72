"""Sinks: partitioned and bucketed table writes.

The reference's only sink is per-reducer tab-text (`TextOutputFormat`,
`/root/reference/src/SlidingAggregation.java:451,469,486,510,528`) —
covered by ``text_kv.write_text_kv``.  A real engine lands data as:

- **partitioned parquet** (`partitionBy`): directory-level partition
  pruning — a date/region filter then skips whole directories at scan
  time, the single biggest lever on a 100 TB table;
- **bucketed tables** (`bucketBy` + `saveAsTable`): pre-shuffled layout
  on the join/agg key, so repeated joins and aggregations on that key
  run with NO exchange — the physical plan shows both join sides
  scan→join directly (verified in tests/test_sinks.py).

At 100 TB you bucket the fact tables once on their join key (e.g.
lineitem by orderkey) and every subsequent orderkey join in every query
skips its shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    **options,
) -> None:
    """Write a (optionally directory-partitioned) table."""
    w = df.write.mode(mode).format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    for k, v in options.items():
        w = w.option(k, v)
    w.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (and optionally sort-ordered) managed table.

    Joins/aggregations keyed on ``bucket_cols`` between tables with the
    same bucket count then plan without an Exchange.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def compact_small_files(spark, path: str, *, fmt: str = "parquet",
                        target_file_bytes: int = 128 * 1024 * 1024,
                        sort_within_by: list[str] | None = None) -> dict:
    """Compact a small-files table in place: rewrite ``path`` with
    file sizes near ``target_file_bytes``.

    The 100 TB operational problem: streaming/incremental writers land
    thousands of KB-sized files per partition; every subsequent scan
    then pays per-file open/footer costs and the driver pays listing
    memory.  Compaction = read → coalesce to ceil(bytes/target) →
    rewrite.  ``coalesce`` (not repartition) narrows partitions WITHOUT
    a shuffle; pass ``sort_within_by`` to restore clustering (e.g. the
    Z-order column) during the rewrite.

    Writes to a sibling temp dir then swaps via two renames
    (path -> .__compact_old__, then tmp -> path).  Data is never lost or
    half-rewritten — each rename is atomic and both directories are
    complete — but the swap itself is NOT atomic: a crash or concurrent
    reader between the two renames sees the table path briefly absent.
    Recovery after a crash in that window: rename .__compact_old__ back
    to the table path (or tmp forward, if it survived).  True
    single-rename atomicity needs a manifest/symlink indirection, i.e. a
    table format (Delta/Iceberg) rather than a bare directory.  Returns
    {'files_before', 'files_after', 'bytes'} for the caller's audit
    log."""
    import os
    import shutil

    def _data_files(p):
        out = []
        for root, _dirs, files in os.walk(p):
            out += [os.path.join(root, f) for f in files
                    if not f.startswith(("_", "."))]
        return out

    before = _data_files(path)
    total = sum(os.path.getsize(f) for f in before)
    n_parts = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.format(fmt).load(path).coalesce(n_parts)
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)
    tmp = path.rstrip("/") + ".__compact_tmp__"
    df.write.mode("overwrite").format(fmt).save(tmp)
    old = path.rstrip("/") + ".__compact_old__"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {
        "files_before": len(before),
        "files_after": len(_data_files(path)),
        "bytes": total,
    }


def overwrite_partitions(
    df: DataFrame, path: str, partition_by: list[str], fmt: str = "parquet"
) -> None:
    """Partition-level upsert: overwrite ONLY the directory partitions
    present in ``df``, leaving every other partition untouched — the
    standard backfill/late-correction write (re-land one day of an
    event table without rewriting the year).

    Implemented with Spark's dynamic partitionOverwriteMode, scoped to
    this one write and restored afterwards: with the STATIC default,
    mode('overwrite') would truncate the whole table first — the
    classic data-loss footgun this helper exists to fence off.  At
    scale the write moves only the affected partitions' bytes; with
    concurrent readers the swap is per-partition-directory, not
    transactional across partitions (a table format is needed for
    that — see sources/versioned.py for the snapshot alternative)."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").format(fmt).partitionBy(*partition_by).save(path)
    finally:
        spark.conf.set(key, prev)
