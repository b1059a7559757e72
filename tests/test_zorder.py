"""Z-order layout (`operators/zorder.py`).

The oracle pins the curve arithmetic; these tests pin the PROPERTIES
the layout exists for: Morton locality (per-bucket bounding boxes are
much smaller than the global box in BOTH dimensions — i.e. min/max file
stats would actually prune) and real physical clustering (z
nondecreasing within each partition, range-disjoint across them).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from uw_mapreduce_spark.operators.zorder import z_value_sql, zorder_by


def _grid(spark, n=64):
    rows = [(x, y) for x in range(n) for y in range(n)]
    return spark.createDataFrame(rows, "x long, y long")


def test_z_interleave_matches_reference_bits(spark):
    # Interleave computed by python bit-twiddling vs the generated SQL.
    df = _grid(spark, 16).withColumn("z", F.expr(z_value_sql("x", "y", 4)))
    for r in df.collect():
        want = 0
        for i in range(4):
            want |= ((r["x"] >> i) & 1) << (2 * i)
            want |= ((r["y"] >> i) & 1) << (2 * i + 1)
        assert r["z"] == want


def test_zorder_buckets_have_tight_bounding_boxes(spark):
    df = _grid(spark, 64)  # uniform 64x64 grid, global range 63 per dim
    z = zorder_by(df, "x", "y", bits=6)
    boxes = (
        z.groupBy(F.expr("__z DIV 256").alias("b"))  # 16 buckets of 256 cells
        .agg(
            (F.max("x") - F.min("x")).alias("xr"),
            (F.max("y") - F.min("y")).alias("yr"),
        )
        .collect()
    )
    # Each 256-cell Z bucket of a 64x64 grid is a 16x16 tile: range 15,
    # vs 63 globally — both dimensions prune by 4x.
    assert len(boxes) == 16
    assert all(r["xr"] == 15 and r["yr"] == 15 for r in boxes)


def test_zorder_partitions_are_sorted_and_range_disjoint(spark):
    df = _grid(spark, 32)
    z = zorder_by(df, "x", "y", bits=5, n_partitions=4)
    per_part = z.select(
        F.spark_partition_id().alias("pid"), "__z"
    ).groupBy("pid").agg(F.min("__z").alias("lo"), F.max("__z").alias("hi"))
    rows = sorted(per_part.collect(), key=lambda r: r["lo"])
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"]  # range partitioning: disjoint z ranges
    # And within partitions the sort is physical:
    def _sorted_within(it):
        ls = [r["__z"] for r in it]
        return [all(a <= b for a, b in zip(ls, ls[1:]))]

    ok = z.select("__z").rdd.mapPartitions(_sorted_within).collect()
    assert all(ok)


def test_zorder_n_dim_interleave_and_locality(spark):
    from pyspark.sql import functions as F

    from uw_mapreduce_spark.operators.zorder import z_value_sql_n, zorder_by_n

    # 3-D interleave matches python bit-twiddling.
    rows = [(x, y, z) for x in range(8) for y in range(8) for z in range(8)]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    got = df.withColumn("m", F.expr(z_value_sql_n(["x", "y", "z"], 3))).collect()
    for r in got:
        want = 0
        for i in range(3):
            want |= ((r["x"] >> i) & 1) << (3 * i)
            want |= ((r["y"] >> i) & 1) << (3 * i + 1)
            want |= ((r["z"] >> i) & 1) << (3 * i + 2)
        assert r["m"] == want
    # 512-cell cube in 8 z-buckets: each bucket is a 4x4x4 octant tile.
    zb = zorder_by_n(df, ["x", "y", "z"], bits=3)
    boxes = (
        zb.groupBy(F.expr("__z DIV 64").alias("b"))
        .agg(
            (F.max("x") - F.min("x")).alias("xr"),
            (F.max("y") - F.min("y")).alias("yr"),
            (F.max("z") - F.min("z")).alias("zr"),
        )
        .collect()
    )
    assert len(boxes) == 8
    assert all(r["xr"] == 3 and r["yr"] == 3 and r["zr"] == 3 for r in boxes)
    # bit-budget guard
    import pytest

    with pytest.raises(ValueError):
        z_value_sql_n(["a"] * 8, 8)
