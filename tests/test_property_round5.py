"""Property-based checks for the round-5 operators: each agrees with a
pure-Python brute-force model on arbitrary hypothesis-generated inputs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from uw_mapreduce_spark.operators.bloomjoin import bloom_semi_join
from uw_mapreduce_spark.operators.intervals import coalesce_intervals
from uw_mapreduce_spark.operators.merge import incremental_rollup

_SETTINGS = settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)


@_SETTINGS
@given(
    probe=st.lists(st.integers(0, 50), min_size=1, max_size=60),
    build=st.sets(st.integers(0, 50), max_size=20),
)
def test_bloom_semi_join_equals_semi_join(spark, probe, build):
    p = spark.createDataFrame([(k,) for k in probe], "k long")
    b = spark.createDataFrame([(k,) for k in build] or [(None,)], "k long").where(
        F.col("k").isNotNull()
    )
    got = sorted(r["k"] for r in bloom_semi_join(p, b, "k", "k").collect())
    want = sorted(k for k in probe if k in build)
    assert got == want


@_SETTINGS
@given(
    ivs=st.lists(
        st.tuples(st.integers(0, 100), st.integers(0, 30)), min_size=1, max_size=40
    )
)
def test_coalesce_intervals_matches_brute_force(spark, ivs):
    rows = [("k", s, s + d) for s, d in ivs]
    df = spark.createDataFrame(rows, "key string, s long, e long")
    got = sorted(
        (r["island_start"], r["island_end"], r["n_merged"])
        for r in coalesce_intervals(df, ["key"], "s", "e").collect()
    )
    # Brute force: sort, sweep, merge while start <= running max end.
    islands = []
    for s, e in sorted((s, e) for _, s, e in rows):
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
            islands[-1][2] += 1
        else:
            islands.append([s, e, 1])
    assert got == sorted((a, b, n) for a, b, n in islands)


@_SETTINGS
@given(
    base=st.lists(
        st.tuples(st.integers(0, 5), st.integers(-100, 100)), min_size=1, max_size=30
    ),
    inserts=st.lists(
        st.tuples(st.integers(0, 5), st.integers(-100, 100)), max_size=15
    ),
    retract_mask=st.lists(st.booleans(), min_size=30, max_size=30),
)
def test_incremental_rollup_equals_recompute(spark, base, inserts, retract_mask):
    retracted = [row for row, m in zip(base, retract_mask) if m]
    survivors = list(base)
    for row in retracted:
        survivors.remove(row)
    survivors += inserts

    snap_df = (
        spark.createDataFrame(base, "k long, v long")
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.sum("v").cast("long").alias("sum_v"))
    )
    chg = [(k, v, 1) for k, v in inserts] + [(k, v, -1) for k, v in retracted]
    if not chg:
        chg = [(0, 0, 1)]
        survivors.append((0, 0))
    chg_df = spark.createDataFrame(chg, "k long, v long, weight int")
    got = sorted(
        tuple(r) for r in incremental_rollup(snap_df, chg_df, ["k"], "v").collect()
    )
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for k, v in survivors:
        agg[k][0] += 1
        agg[k][1] += v
    want = sorted((k, n, s) for k, (n, s) in agg.items() if n > 0)
    assert got == want


_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])


@_SETTINGS
@given(
    docs=st.lists(st.lists(_word, max_size=12), min_size=1, max_size=10),
    qterms=st.lists(_word, min_size=1, max_size=3, unique=True),
)
def test_bm25_matches_python_on_random_corpora(spark, docs, qterms):
    from tests.test_retrieval import _py_bm25
    from uw_mapreduce_spark.operators.retrieval import bm25_topk

    rows = [(f"d{i}", " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score_micro"])
        for r in bm25_topk(df, [("q", qterms)], k=100).collect()
    }
    want = _py_bm25(rows, [("q", qterms)])
    assert len(got) == len(want["q"])
    for rank, (doc, score) in enumerate(want["q"], start=1):
        assert got[("q", rank)] == (doc, score)


@_SETTINGS
@given(
    old=st.dictionaries(st.integers(0, 15), st.integers(0, 3), max_size=12),
    new=st.dictionaries(st.integers(0, 15), st.integers(0, 3), max_size=12),
)
def test_table_diff_matches_brute_force(spark, old, new):
    from uw_mapreduce_spark.operators.diff import table_diff

    o = spark.createDataFrame(list(old.items()) or [(None, None)], "k long, v long").where(
        F.col("k").isNotNull()
    )
    n = spark.createDataFrame(list(new.items()) or [(None, None)], "k long, v long").where(
        F.col("k").isNotNull()
    )
    got = {r["k"]: r["diff_status"] for r in table_diff(o, n, ["k"]).collect()}
    want = {}
    for k in set(old) | set(new):
        if k not in old:
            want[k] = "added"
        elif k not in new:
            want[k] = "removed"
        else:
            want[k] = "unchanged" if old[k] == new[k] else "changed"
    assert got == want


@_SETTINGS
@given(vals=st.lists(st.integers(-1000, 1000), min_size=12, max_size=40))
def test_rolling_zscore_matches_python(spark, vals):
    from uw_mapreduce_spark.operators.anomaly import rolling_zscore_anomalies

    rows = [("u", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, seq long, v long")
    got = sorted(
        r["seq"]
        for r in rolling_zscore_anomalies(
            df, ["key"], ["seq"], "v", window=10, k=3, min_history=5
        ).collect()
    )
    want = []
    for i, x in enumerate(vals):
        hist = vals[max(0, i - 10):i]
        n = len(hist)
        if n < 5:
            continue
        s, ss = sum(hist), sum(h * h for h in hist)
        if (n * x - s) ** 2 > 9 * (n * ss - s * s):
            want.append(i)
    assert got == want
