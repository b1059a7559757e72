"""Versioned tables (`sources/versioned.py`): linear version history,
manifest-as-commit-point (orphaned data invisible), pinned re-reads,
and vacuum keeping the newest N.
"""

from __future__ import annotations

import os

import pytest

from uw_mapreduce_spark.sources.versioned import (
    list_versions,
    read_version,
    vacuum_versions,
    write_version,
)


def test_versioned_write_read_pin_and_vacuum(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = write_version(spark.range(5), t)
    v2 = write_version(spark.range(10), t)
    v3 = write_version(spark.range(3), t)
    assert (v1, v2, v3) == (1, 2, 3)
    assert list_versions(t) == [1, 2, 3]
    # Latest by default; any committed version pinnable.
    assert read_version(spark, t).count() == 3
    assert read_version(spark, t, 2).count() == 10
    # Vacuum keeps the newest N; vacuumed versions stop resolving.
    assert vacuum_versions(t, keep_last=2) == [1]
    assert list_versions(t) == [2, 3]
    with pytest.raises(FileNotFoundError):
        read_version(spark, t, 1)
    assert read_version(spark, t, 2).count() == 10


def test_versioned_orphan_data_is_invisible(spark, tmp_path):
    """A data directory without its manifest (crash between data write
    and commit) must not surface as a readable version."""
    t = str(tmp_path / "tbl")
    write_version(spark.range(4), t)
    # Simulate a crashed write: stage v=2 data, no manifest.
    spark.range(99).write.parquet(os.path.join(t, "v=2"))
    assert list_versions(t) == [1]
    assert read_version(spark, t).count() == 4
    # The next successful publish claims version 2... the orphan dir is
    # overwritten by the legitimate writer (mode=overwrite).
    v = write_version(spark.range(7), t)
    assert v == 2 and read_version(spark, t).count() == 7


def test_overwrite_partitions_touches_only_present_partitions(spark, tmp_path):
    """Dynamic partition overwrite: re-landing one partition must leave
    the others byte-identical, and a plain static overwrite of the same
    frame would NOT (it truncates the table) — both directions pinned."""
    from pyspark.sql import functions as F

    from uw_mapreduce_spark.sources.sinks import overwrite_partitions

    t = str(tmp_path / "events_p")
    base = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-02", 3)], "d string, v int"
    )
    overwrite_partitions(base, t, ["d"])
    fix = spark.createDataFrame([("2024-01-02", 99)], "d string, v int")
    overwrite_partitions(fix, t, ["d"])
    # Partition-dir values infer back as dates — compare as strings.
    got = sorted((str(r.d), r.v) for r in spark.read.parquet(t).collect())
    assert got == [("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-02", 99)]
    # Config restored: a subsequent plain overwrite behaves statically.
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode").upper() == "STATIC"
    )
    fix.write.mode("overwrite").partitionBy("d").parquet(t)
    assert sorted((str(r.d), r.v) for r in spark.read.parquet(t).collect()) == [
        ("2024-01-02", 99)
    ]
