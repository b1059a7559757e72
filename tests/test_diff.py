"""Table diff: status classification, null-safe column compare, and
the fixed-size summary."""

from __future__ import annotations

from uw_mapreduce_spark.operators.diff import diff_summary, table_diff, table_diff_columns


def test_statuses_and_null_safety(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, None), (3, 30, "c"), (4, 40, "d")],
        "k long, v long, s string",
    )
    right = spark.createDataFrame(
        [(1, 10, "a"),        # unchanged
         (2, 20, None),       # unchanged (NULL == NULL null-safely)
         (3, 31, "c"),        # changed (v)
         (5, 50, "e")],       # added; k=4 removed
        "k long, v long, s string",
    )
    d = table_diff_columns(left, right, ["k"], ["v", "s"])
    got = {r["k"]: r["diff_status"] for r in d.collect()}
    assert got == {1: "unchanged", 2: "unchanged", 3: "changed", 4: "removed", 5: "added"}
    flags = {r["k"]: (r["changed_v"], r["changed_s"]) for r in d.collect()}
    assert flags[3] == (True, False)
    assert flags[4] == (False, False)  # removed rows carry no column flags


def test_null_vs_value_counts_as_changed(spark):
    left = spark.createDataFrame([(1, None)], "k long, s string")
    right = spark.createDataFrame([(1, "x")], "k long, s string")
    d = table_diff_columns(left, right, ["k"], ["s"])
    assert d.collect()[0]["diff_status"] == "changed"


def test_summary_counts(spark):
    left = spark.createDataFrame([(i, i) for i in range(10)], "k long, v long")
    right = spark.createDataFrame(
        [(i, i + (1 if i % 3 == 0 else 0)) for i in range(2, 12)], "k long, v long"
    )
    d = table_diff_columns(left, right, ["k"], ["v"])
    s = {r["bucket"]: r["n"] for r in diff_summary(d, ["v"]).collect()}
    # removed: 0,1; added: 10,11; changed: 3,6,9 (i%3==0 within 2..9)
    assert s["removed"] == 2 and s["added"] == 2
    assert s["changed"] == 3 and s["col:v"] == 3
    assert s["unchanged"] == 5
