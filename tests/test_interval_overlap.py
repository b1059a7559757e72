"""interval_overlap_join: lossless + exactly-once vs the quadratic
truth on randomized interval sets spanning many buckets."""

import numpy as np
from pyspark.sql import functions as F

from uw_mapreduce_spark.operators.intervals import interval_overlap_join


def _truth(rows_a, rows_b, cross_only=True):
    out = {}
    for ia, (ka, s, e) in enumerate(rows_a):
        for ib, (kb, s2, e2) in enumerate(rows_b):
            if cross_only and not (ka < kb):
                continue
            if s <= e2 and s2 <= e:
                out[(ka, s, e, kb, s2, e2)] = min(e, e2) - max(s, s2)
    return out


def test_overlap_join_matches_bruteforce(spark):
    rng = np.random.RandomState(13)
    W = 1000  # bucket width
    rows = []
    for k in range(30):
        for _ in range(4):
            s = int(rng.randint(0, 20 * W))
            ln = int(rng.randint(0, 3 * W))  # 0-length up to 3 buckets
            rows.append((k, s, s + ln))
    df = spark.createDataFrame(rows, "k long, t0_us long, t1_us long")
    got = {
        (r["l_k"], r["l_t0_us"], r["l_t1_us"], r["r_k"], r["r_t0_us"], r["r_t1_us"]): r["overlap_us"]
        for r in interval_overlap_join(
            df, df, bucket_us=W, extra_pred=F.col("l_k") < F.col("r_k")
        ).collect()
    }
    assert got == _truth(rows, rows)


def test_overlap_join_emits_each_pair_once(spark):
    # two long intervals sharing many buckets: exactly one output row
    df = spark.createDataFrame(
        [(1, 0, 10_000), (2, 5, 9_000)], "k long, t0_us long, t1_us long"
    )
    out = interval_overlap_join(
        df, df, bucket_us=100, extra_pred=F.col("l_k") < F.col("r_k")
    ).collect()
    assert len(out) == 1 and out[0]["overlap_us"] == 9_000 - 5


def test_touching_and_disjoint(spark):
    df = spark.createDataFrame(
        [(1, 0, 100), (2, 100, 200), (3, 201, 300)],
        "k long, t0_us long, t1_us long",
    )
    out = {
        (r["l_k"], r["r_k"]): r["overlap_us"]
        for r in interval_overlap_join(
            df, df, bucket_us=50, extra_pred=F.col("l_k") < F.col("r_k")
        ).collect()
    }
    assert out == {(1, 2): 0}  # touch counts (closed intervals), disjoint doesn't
