"""Two-pass exact heavy hitters: exactness vs brute force, MG pruning
under tight capacity, partitioning invariance."""

from collections import Counter

import pytest


@pytest.fixture(scope="module")
def spark():
    from uw_mapreduce_spark.session import get_spark

    return get_spark(app_name="hh-tests", master="local[4]", shuffle_partitions=8)


def _truth(vals, k):
    c = Counter(vals)
    n = len(vals)
    return {key: v for key, v in c.items() if v * k > n}


def _run(spark, vals, k, parts=4, capacity=None):
    from uw_mapreduce_spark.operators.heavyhitters import exact_heavy_hitters

    df = spark.createDataFrame([(v,) for v in vals], "g string").repartition(parts)
    out = exact_heavy_hitters(df, "g", k=k, capacity=capacity)
    return {r["g"]: r["cnt"] for r in out.collect()}


def test_matches_bruteforce(spark):
    vals = (["hot"] * 400 + ["warm"] * 120 + ["mild"] * 40
            + [f"cold{i}" for i in range(440)])
    assert _run(spark, vals, k=10) == _truth(vals, 10)


def test_tight_capacity_still_exact(spark):
    """capacity == k (the minimum honoring the superset bound) forces
    heavy MG pruning yet the verified output stays exact."""
    vals = ["a"] * 300 + ["b"] * 200 + [f"z{i % 97}" for i in range(500)]
    truth = _truth(vals, 5)
    assert truth  # the test is vacuous if nothing is heavy
    assert _run(spark, vals, k=5, capacity=5) == truth


def test_partitioning_invariance(spark):
    vals = ["x"] * 50 + ["y"] * 30 + [f"t{i}" for i in range(120)]
    r1 = _run(spark, vals, k=4, parts=1)
    r8 = _run(spark, vals, k=4, parts=8)
    assert r1 == r8 == _truth(vals, 4)


def test_no_heavy_hitters_is_empty(spark):
    vals = [f"u{i}" for i in range(200)]  # all unique
    assert _run(spark, vals, k=100) == {}
