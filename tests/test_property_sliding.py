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


@settings(deadline=None, max_examples=12, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(1, 50)),  # (key, multiplicity)
        min_size=1, max_size=12, unique_by=lambda t: t[0],
    ),
    st.integers(2, 6),
)
def test_borders_partition_invariants(spark, key_mults, p):
    """For arbitrary key multisets (including heavy keys): borders are
    sorted, within the key domain, deterministic, and the derived
    ranges cover every row exactly once."""
    import pyspark.sql.functions as F

    from uw_mapreduce_spark.operators.scale import _deterministic_borders, _pid_expr

    rows = [(k,) for k, m in key_mults for _ in range(m)]
    df = spark.createDataFrame(rows, "k long")
    borders = _deterministic_borders(df, "k", p, sample_per_partition=4)
    assert borders == sorted(set(borders))
    assert len(borders) <= p - 1
    keys = sorted(k for k, _ in key_mults)
    assert all(keys[0] <= b <= keys[-1] for b in borders)
    assert borders == _deterministic_borders(df, "k", p, sample_per_partition=4)
    tagged = df.withColumn("_pid", _pid_expr("k", borders))
    assert tagged.count() == len(rows)            # total cover, no loss
    assert tagged.where(F.col("_pid").isNull()).count() == 0
    # ranges are order-respecting: max key of partition i < min key of i+1
    bounds = tagged.groupBy("_pid").agg(
        F.min("k").alias("lo"), F.max("k").alias("hi")
    ).orderBy("_pid").collect()
    for a, b in zip(bounds, bounds[1:]):
        assert a["hi"] < b["lo"]


pack_strategy = st.lists(st.integers(0, 50), min_size=1, max_size=30)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(sizes=pack_strategy, budget=st.integers(1, 64))
def test_pack_documents_matches_brute_force(spark, sizes, budget):
    """Token-stream packing agrees with a pure-Python prefix-sum model
    on arbitrary document-size multisets and budgets (incl. budget=1,
    zero-token docs, docs far larger than the budget)."""
    from uw_mapreduce_spark.operators.packing import pack_documents

    rows = [(i, n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = sorted(
        (r.doc_id, r.start_offset, r.first_pack, r.last_pack, r.n_packs_spanned)
        for r in pack_documents(
            df, "n_tokens", budget=budget, order_by=["doc_id"], num_partitions=3
        ).collect()
    )
    expected, off = [], 0
    for i, n in enumerate(sizes):
        first = off // budget
        last = (off + n - 1) // budget if n > 0 else first
        expected.append((i, off, first, last, last - first + 1))
        off += n
    assert got == expected


gap_rows_strategy = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 40), st.integers(-100, 100)),
    min_size=1,
    max_size=25,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=gap_rows_strategy)
def test_gap_fill_matches_brute_force(spark, rows):
    """gap_fill_locf agrees with a pure-Python model on arbitrary
    (key, hour, value) multisets — duplicate buckets (last ts wins,
    value desc as tiebreak on equal ts), gaps, single-point keys."""
    import datetime

    from uw_mapreduce_spark.operators.resample import gap_fill_locf

    t0 = datetime.datetime(2024, 1, 1)
    data = [
        (k, t0 + datetime.timedelta(hours=h), v) for k, h, v in rows
    ]
    df = spark.createDataFrame(data, "k long, ts timestamp, v long")
    got = {
        (r.k, r.bucket): (r.n_obs, r.carried)
        for r in gap_fill_locf(df, ["k"], "ts", "v").collect()
    }

    base = int(t0.replace(tzinfo=datetime.timezone.utc).timestamp()) // 3600
    per_key: dict = {}
    for k, h, v in rows:
        per_key.setdefault(k, {}).setdefault(h, []).append(v)
    expected = {}
    for k, buckets in per_key.items():
        lo, hi = min(buckets), max(buckets)
        carried = None
        for h in range(lo, hi + 1):
            if h in buckets:
                # same ts within bucket: operator breaks ties by value desc
                carried = max(buckets[h])
                expected[(k, base + h)] = (len(buckets[h]), carried)
            else:
                expected[(k, base + h)] = (0, carried)
    assert got == expected
