"""Range join and continuous-aggregate rollup — constructed truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from uw_mapreduce_spark.operators.rangejoin import range_join
from uw_mapreduce_spark.operators.rollup import continuous_aggregate


def test_range_join_containment_and_boundaries(spark):
    pts = spark.createDataFrame([(i, i * 10) for i in range(1, 8)], "pid long, x long")
    iv = spark.createDataFrame(
        [(100, 10, 30), (200, 30, 70), (300, 65, 100)], "ivid long, lo long, hi long"
    )
    # width much smaller than interval length: intervals explode to many
    # buckets, exercising the multi-bucket path.
    got = {
        (r.pid, r.ivid)
        for r in range_join(pts, iv, "x", "lo", "hi", width=7, closed="right").collect()
    }
    expected = set()
    for pid in range(1, 8):
        x = pid * 10
        for ivid, lo, hi in [(100, 10, 30), (200, 30, 70), (300, 65, 100)]:
            if lo < x <= hi:  # (lo, hi]
                expected.add((pid, ivid))
    assert got == expected
    # boundary x=30 belongs to (10,30] only; x=70 to both (30,70] and (65,100]
    assert (3, 100) in got and (3, 200) not in got
    assert (7, 200) in got and (7, 300) in got


def test_range_join_closed_left_and_keys(spark):
    pts = spark.createDataFrame([(1, "a", 10), (2, "b", 10)], "pid long, k string, x long")
    iv = spark.createDataFrame([("a", 10, 20)], "k string, lo long, hi long")
    got = range_join(pts, iv, "x", "lo", "hi", width=5, on=["k"], closed="left").collect()
    assert [(r.pid, r.k) for r in got] == [(1, "a")]  # [10,20) includes 10; key 'b' filtered


def test_range_join_no_duplicate_pairs(spark):
    # A point and an interval share several buckets only via the interval's
    # explode; the pair must still appear exactly once.
    pts = spark.createDataFrame([(1, 50)], "pid long, x long")
    iv = spark.createDataFrame([(9, 0, 100)], "ivid long, lo long, hi long")
    rows = range_join(pts, iv, "x", "lo", "hi", width=3, closed="both").collect()
    assert len(rows) == 1


def test_continuous_aggregate_two_resolutions(spark):
    rows = [
        (1_000_000 * 3600 * h + 1, "click", 1) for h in range(30)
    ]  # one event per hour for 30h, starting just past each hour
    df = spark.createDataFrame(rows, "ts_us long, event_type string, v long")
    out = continuous_aggregate(
        df,
        "ts_us",
        {"b6h": 6 * 3600 * 1_000_000, "b1d": 24 * 3600 * 1_000_000},
        ["event_type"],
        [F.count(F.lit(1)).alias("n")],
    ).collect()
    six = {r.b6h: r.n for r in out if r.b6h is not None}
    day = {r.b1d: r.n for r in out if r.b1d is not None}
    assert sum(six.values()) == 30 and sum(day.values()) == 30
    assert six[0] == 6  # first 6h bucket holds hours 0..5
    assert day[0] == 24 and day[24 * 3600 * 1_000_000] == 6
    # every output row belongs to exactly one resolution
    assert all((r.b6h is None) != (r.b1d is None) for r in out)


def test_connected_components_chain_and_islands(spark):
    from uw_mapreduce_spark.operators.graph import connected_components

    # chain 1-2-3-4-5 (diameter 4, needs several rounds), island 10-11,
    # and 20-21 + 21-22 sharing a vertex
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (21, 20), (21, 22)],
        "doc_a long, doc_b long",
    )
    got = {r.v: r.label for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_long_chain_log_rounds(spark):
    """A 200-hop chain (diameter 200 >> max_iter=25) must still converge:
    pointer doubling makes the round count O(log diameter), so the long
    near-duplicate chain that would have tripped pure min-label
    propagation now labels in ~8 rounds."""
    from uw_mapreduce_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "doc_a long, doc_b long"
    )
    got = {r.v: r.label for r in connected_components(edges).collect()}
    assert got == {v: 0 for v in range(201)}


def test_continuous_aggregate_ntz_and_null_ts(spark):
    """timestamp_ntz buckets like timestamp; NULL-ts rows are dropped
    rather than masquerading as grouping-set null markers."""
    import pyspark.sql.functions as F

    from uw_mapreduce_spark.operators.rollup import continuous_aggregate

    df = spark.createDataFrame(
        [("2024-01-01 00:30:00", 1), ("2024-01-01 05:00:00", 2), (None, 99)],
        "t string, v int",
    ).select(F.col("t").cast("timestamp_ntz").alias("t"), "v")
    assert dict(df.dtypes)["t"] == "timestamp_ntz"
    out = continuous_aggregate(
        df, "t", {"b6h": 6 * 3600 * 1_000_000}, [], [F.sum("v").alias("s")]
    ).collect()
    assert len(out) == 1 and out[0].s == 3  # one 6h bucket; NULL row gone


def test_gap_fill_locf_constructed(spark):
    """Constructed truth: user 1 has events in hours {0, 3} — hours 1-2
    must appear with n_obs=0 carrying hour 0's LAST value (later ts wins
    within a bucket); user 2 has a single hour (grid of one)."""
    import datetime

    from pyspark.sql import functions as F

    from uw_mapreduce_spark.operators.resample import gap_fill_locf

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(h, m=0):
        return t0 + datetime.timedelta(hours=h, minutes=m)

    rows = [
        (1, ts(0, 10), 100),
        (1, ts(0, 50), 111),  # same bucket, later ts -> wins
        (1, ts(3, 0), 300),
        (2, ts(5, 0), 500),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, v long")
    out = {
        (r.user_id, r.bucket): (r.n_obs, r.carried)
        for r in gap_fill_locf(df, ["user_id"], "ts", "v").collect()
    }
    base = next(b for (u, b) in out if u == 1)  # first bucket of user 1
    assert out[(1, base)] == (2, 111)
    assert out[(1, base + 1)] == (0, 111)
    assert out[(1, base + 2)] == (0, 111)
    assert out[(1, base + 3)] == (1, 300)
    assert len([1 for (u, _) in out if u == 2]) == 1
    assert [v for (u, _), v in out.items() if u == 2] == [(1, 500)]


def test_coalesce_intervals_islands(spark):
    from uw_mapreduce_spark.operators.intervals import coalesce_intervals

    rows = [
        ("k", 0, 10), ("k", 5, 15), ("k", 15, 20),   # overlap + touch -> one island
        ("k", 30, 40),                                # gap -> new island
        ("k", 35, 36),                                # nested inside previous
        ("q", 0, 1),
    ]
    df = spark.createDataFrame(rows, "key string, s long, e long")
    got = {
        (r["key"], r["island_id"]): (r["island_start"], r["island_end"], r["n_merged"])
        for r in coalesce_intervals(df, ["key"], "s", "e").collect()
    }
    assert got == {
        ("k", 1): (0, 20, 3),
        ("k", 2): (30, 40, 2),
        ("q", 1): (0, 1, 1),
    }
    # touch_merges=False splits the touching pair.
    got2 = {
        (r["key"], r["island_id"]): r["n_merged"]
        for r in coalesce_intervals(
            df, ["key"], "s", "e", touch_merges=False
        ).collect()
    }
    assert got2[("k", 1)] == 2 and got2[("k", 2)] == 1
