"""Count-min sketch (`operators/sketch.py`) structural properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from uw_mapreduce_spark.operators.sketch import count_min_estimates


def _items(spark):
    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 15 + [("d",)] * 5
    return spark.createDataFrame(rows, "item string")


def test_cms_never_undercounts_and_wide_sketch_is_exact(spark):
    df = _items(spark)
    tight = count_min_estimates(df, "item", depth=4, width=2, check_top=10).collect()
    assert all(r["est_n"] >= r["n_exact"] for r in tight)  # one-sided error
    wide = count_min_estimates(df, "item", depth=4, width=1 << 14, check_top=10).collect()
    assert all(r["overcount"] == 0 for r in wide)  # no collisions at 4 items / 16k cells
    assert {r["item"]: r["n_exact"] for r in wide} == {"a": 50, "b": 30, "c": 15, "d": 5}


def test_cms_width_one_collapses_to_total_count(spark):
    df = _items(spark)
    rows = count_min_estimates(df, "item", depth=4, width=1, check_top=10).collect()
    assert all(r["est_n"] == 100 for r in rows)  # every cell holds the grand total


def test_cms_on_documents_has_real_collisions(spark, sf_small):
    from uw_mapreduce_spark.functions.text import tokens
    from uw_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("t")).where(F.col("t") != "")
    rows = count_min_estimates(toks, "t", depth=4, width=16, check_top=20).collect()
    assert all(r["est_n"] >= r["n_exact"] for r in rows)
    # w=16 under a ~31-token vocabulary: at least one top token collides
    # in all 4 rows, so the driver query exercises non-zero overcount.
    assert any(r["overcount"] > 0 for r in rows)
