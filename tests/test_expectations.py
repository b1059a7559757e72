"""Expectation-suite operator: conditional-count and uniqueness
semantics on a constructed frame, plus the one-pass plan property."""

import pytest
from pyspark.sql import functions as F

from uw_mapreduce_spark.operators.expectations import (
    Expectation,
    evaluate_expectations,
)


def test_expectations_counts_and_pass_flags(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (2, -5, "a"), (2, 3, None), (4, 0, "z")],
        "k long, v long, cat string",
    )
    out = evaluate_expectations(
        df,
        [
            Expectation("v_positive", violation=~(F.col("v") > 0)),
            Expectation("cat_not_null", violation=F.col("cat").isNull()),
            Expectation("k_unique", unique_key="k"),
            Expectation("cat_in_set", violation=~F.col("cat").isin("a", "b") | F.col("cat").isNull()),
        ],
    )
    rows = {r["expectation"]: r for r in out.collect()}
    assert all(r["n_rows"] == 4 for r in rows.values())
    assert rows["v_positive"]["violations"] == 2          # -5 and 0
    assert rows["cat_not_null"]["violations"] == 1
    assert rows["k_unique"]["violations"] == 1            # k=2 twice
    assert rows["cat_in_set"]["violations"] == 2          # None and 'z'
    assert not any(r["passed"] for r in rows.values())


def test_expectations_all_pass(spark):
    df = spark.createDataFrame([(1, 1), (2, 2)], "k long, v long")
    out = evaluate_expectations(
        df,
        [
            Expectation("v_positive", violation=~(F.col("v") > 0)),
            Expectation("k_unique", unique_key="k"),
        ],
    )
    assert all(r["passed"] and r["violations"] == 0 for r in out.collect())


def test_expectation_requires_exactly_one_kind():
    with pytest.raises(ValueError):
        Expectation("bad")
    with pytest.raises(ValueError):
        Expectation("bad", violation=F.lit(True), unique_key="k")


def test_expectations_single_scan_plan(spark):
    """The whole suite must fold into one pass: a single scan of the
    source appears in the physical plan no matter how many row-level
    constraints ride along."""
    df = spark.range(100).withColumn("v", F.col("id") % 7)
    out = evaluate_expectations(
        df,
        [
            Expectation("a", violation=F.col("v") > 100),
            Expectation("b", violation=F.col("v") < 0),
            Expectation("c", unique_key="id"),
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1
