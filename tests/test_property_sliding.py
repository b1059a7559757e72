"""Property-based check: every sliding path agrees with a pure-Python
brute-force model on arbitrary inputs (hypothesis-generated)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from uw_mapreduce_spark.operators.scale import (
    sliding_aggregate_scalable,
    sliding_minmax_scalable,
)
from uw_mapreduce_spark.operators.window import sliding_aggregate

rows_strategy = st.lists(
    st.tuples(st.integers(-1000, 1000), st.integers(-10**6, 10**6)),
    min_size=1,
    max_size=40,
)


def brute(rows, l, agg):
    ordered = sorted(rows)
    out = []
    for r in range(len(ordered)):
        win = [v for _, v in ordered[max(0, r - l + 1): r + 1]]
        out.append((r, {"sum": sum, "min": min, "max": max}[agg](win)))
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy, l=st.integers(1, 50))
def test_sliding_paths_match_brute_force(spark, rows, l):
    df = spark.createDataFrame(rows, "key long, value long")
    expected_sum = brute(rows, l, "sum")
    got_w = sorted(
        (r["rank"], r["agg"])
        for r in sliding_aggregate(df, ["key", "value"], "value", l).collect()
    )
    got_s = sorted(
        (r["rank"], r["agg"])
        for r in sliding_aggregate_scalable(
            df, ["key", "value"], "value", l, num_partitions=3
        ).collect()
    )
    assert got_w == expected_sum
    assert got_s == expected_sum
    expected_min = brute(rows, l, "min")
    got_m = sorted(
        (r["rank"], r["agg"])
        for r in sliding_minmax_scalable(
            df, ["key", "value"], "value", l, agg="min", num_partitions=3
        ).collect()
    )
    assert got_m == expected_min
