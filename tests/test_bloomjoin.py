"""Bloom-filter join pruning (`operators/bloomjoin.py`).

The contract under test: bloom_semi_join is RESULT-IDENTICAL to a plain
left-semi join (false positives removed by the verify join, false
negatives impossible), the map-only prune never drops a true match, and
the filter actually prunes when the build side is selective.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from uw_mapreduce_spark.operators.bloomjoin import (
    bloom_build,
    bloom_prune,
    bloom_semi_join,
)
from uw_mapreduce_spark.sources.tables import load_table


def test_bloom_semi_join_matches_plain_semi_join(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem")
    orders = load_table(spark, sf_small, "orders").where(F.col("o_totalprice") > 450000)
    exact = li.join(
        orders.select("o_orderkey").distinct(), li.l_orderkey == F.col("o_orderkey"), "left_semi"
    )
    got = bloom_semi_join(li, orders, "l_orderkey", "o_orderkey")
    assert exact.exceptAll(got).count() == 0
    assert got.exceptAll(exact).count() == 0


def test_bloom_prune_keeps_all_true_matches_and_prunes(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem")
    keys = (
        load_table(spark, sf_small, "orders")
        .where(F.col("o_totalprice") > 450000)
        .select("o_orderkey")
        .distinct()
    )
    words = bloom_build(keys, "o_orderkey")
    survivors = bloom_prune(li, "l_orderkey", words)
    # No false negatives: every truly-matching row survives the prune.
    true_matches = li.join(keys, li.l_orderkey == keys.o_orderkey, "left_semi")
    assert true_matches.exceptAll(survivors.select(*li.columns)).count() == 0
    # And the filter genuinely prunes (selective build side).
    assert survivors.count() < li.count()


def test_bloom_semi_join_casts_mismatched_key_types(spark):
    probe = spark.createDataFrame(
        [(i,) for i in range(1000)], "k long"
    )
    build = spark.createDataFrame([(7,), (13,), (999,)], "b int")  # int vs long
    got = bloom_semi_join(probe, build, "k", "b")
    assert sorted(r["k"] for r in got.collect()) == [7, 13, 999]


def test_bloom_semi_join_narrowing_cast_drops_wrapped_keys(spark):
    # LONG build keys against an INT probe column: 2^32 + 7 would wrap
    # onto 7 under a blind cast and manufacture a match a plain semi
    # join (which widens both sides) rejects. The round-trip filter must
    # drop the out-of-range key while keeping in-range ones.
    probe = spark.createDataFrame([(7,), (13,), (21,)], "k int")
    build = spark.createDataFrame([((1 << 32) + 7,), (13,)], "b long")
    exact = probe.join(build, probe.k == build.b, "left_semi")
    got = bloom_semi_join(probe, build, "k", "b")
    assert sorted(r["k"] for r in exact.collect()) == [13]
    assert sorted(r["k"] for r in got.collect()) == [13]


def test_bloom_build_rejects_bad_sizes(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        bloom_build(df, "k", n_bits=3 << 10)  # not a power of two
    with pytest.raises(ValueError):
        bloom_build(df, "k", n_bits=1 << 30)  # over the collect cap
    with pytest.raises(ValueError):
        bloom_build(df, "k", n_bits=32)  # below one 64-bit word


def test_bloom_semi_join_handles_null_keys(spark):
    probe = spark.createDataFrame([(1,), (2,), (None,)], "k long")
    build = spark.createDataFrame([(2,), (None,)], "b long")
    got = sorted(
        r["k"] for r in bloom_semi_join(probe, build, "k", "b").collect()
    )
    # NULL never equi-joins: same answer as a plain semi join.
    assert got == [2]
