"""Column profiling and rolling z-score detection on constructed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from uw_mapreduce_spark.operators.anomaly import rolling_zscore_anomalies
from uw_mapreduce_spark.operators.profile import profile_columns


def test_profile_columns_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b")], "k long, s string"
    )
    got = {r["col_name"]: r for r in profile_columns(df, ["k", "s"]).collect()}
    assert got["k"]["n_rows"] == 4 and got["k"]["n_null"] == 0
    assert got["k"]["n_distinct"] == 4
    assert (got["k"]["min_repr"], got["k"]["max_repr"]) == ("1", "4")
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert (got["s"]["min_repr"], got["s"]["max_repr"]) == ("a", "b")


def test_rolling_zscore_flags_spike_not_warmup(spark):
    # 30 steady points (value 100 +/- 1 alternating) then one 10x spike.
    rows = [("u", i, 100 + (i % 2)) for i in range(30)] + [("u", 30, 1000)]
    df = spark.createDataFrame(rows, "user_id string, seq long, v long")
    out = rolling_zscore_anomalies(
        df, ["user_id"], ["seq"], "v", window=20, k=3, min_history=10
    ).collect()
    assert [r["seq"] for r in out] == [30]  # only the spike; warmup silent


def test_rolling_zscore_constant_history_flags_any_change(spark):
    rows = [("u", i, 50) for i in range(15)] + [("u", 15, 51)]
    df = spark.createDataFrame(rows, "user_id string, seq long, v long")
    out = rolling_zscore_anomalies(
        df, ["user_id"], ["seq"], "v", window=20, k=3, min_history=10
    ).collect()
    # Zero variance history: any deviation exceeds k sigma (strict >).
    assert [r["seq"] for r in out] == [15]
