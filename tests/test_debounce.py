"""Debounce operator: greedy keep-chain semantics (the case a naive
lag-window gets wrong), pure-Python model parity, and partitioning
invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from uw_mapreduce_spark.operators.debounce import debounce


def _model(rows, gap):
    """rows: (key, ts) sorted any order -> {ts: kept}"""
    out = {}
    by_key: dict = {}
    for k, t in sorted(rows, key=lambda r: (r[0], r[1])):
        last = by_key.get(k)
        kept = last is None or t - last >= gap
        if kept:
            by_key[k] = t
        out[(k, t)] = kept
    return out


def test_chained_drops_differ_from_lag(spark):
    # ts: 0, 60, 120, 200 with gap 100.
    # Greedy chain: keep 0, drop 60 (gap 60), drop 120 (120-0 >= 100?
    # YES -> keep 120!), then 200-120=80 -> drop.  A lag-over-raw-ts
    # filter would instead compare each row to its PREDECESSOR (60 vs
    # 0, 120 vs 60, 200 vs 120) and keep only row 0 — chained drops
    # are where the two semantics split.
    rows = [(1, 0), (1, 60), (1, 120), (1, 200)]
    df = spark.createDataFrame(rows, "k long, t long")
    got = {
        r["t"]: r["kept"]
        for r in debounce(df, ["k"], "t", gap=100).collect()
    }
    assert got == {0: True, 60: False, 120: True, 200: False}
    # the naive lag answer would be {0: True, 60: False, 120: False,
    # 200: False} — assert we did NOT compute that
    lagged = {
        r["t"]: r["kept"]
        for r in df.withColumn(
            "kept",
            F.coalesce(
                F.col("t") - F.lag("t").over(
                    __import__("pyspark.sql.window", fromlist=["Window"])
                    .Window.partitionBy("k").orderBy("t")
                ) >= 100,
                F.lit(True),
            ),
        ).collect()
    }
    assert lagged[120] is False and got[120] is True


def test_matches_python_model_and_partition_invariance(spark):
    import random

    rng = random.Random(11)
    rows = [
        (rng.randrange(5), rng.randrange(0, 10_000))
        for _ in range(300)
    ]
    rows = list({(k, t) for k, t in rows})  # unique (k, ts)
    df = spark.createDataFrame(rows, "k long, t long")
    want = _model(rows, gap=500)
    for parts in (1, 7):
        got = {
            (r["k"], r["t"]): r["kept"]
            for r in debounce(df.repartition(parts), ["k"], "t", gap=500).collect()
        }
        assert got == want


def test_row_set_preserved(spark):
    df = spark.createDataFrame([(1, 10, "a"), (1, 20, "b"), (2, 5, "c")], "k long, t long, payload string")
    out = debounce(df, ["k"], "t", gap=100)
    assert out.count() == 3
    assert set(out.columns) == {"k", "t", "payload", "kept"}
