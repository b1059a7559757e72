"""Nearest-centroid classifier (`operators/classify`): exact-integer
centroid sums vs a pure-Python model, the split learn/apply contract,
and the tie → smallest-label rule."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from uw_mapreduce_spark.operators.classify import (
    label_centroid_sums,
    nearest_centroid_classify,
)

SCALE = 1_000_000


def _q(x: float) -> int:
    return math.floor(x * float(SCALE))


def _model(rows):
    """Pure-Python nearest-centroid over (id, vec, label) rows."""
    sums: dict[int, list[int]] = {}
    for _, vec, lbl in rows:
        s = sums.setdefault(lbl, [0] * len(vec))
        for i, x in enumerate(vec):
            s[i] += _q(x)
    out = {}
    for rid, vec, lbl in rows:
        qv = [_q(x) for x in vec]
        best = None
        for cl in sorted(sums):
            s = sums[cl]
            d = sum(a * b for a, b in zip(qv, s))
            score = float(d) / math.sqrt(float(sum(c * c for c in s)))
            if best is None or score > best[0]:
                best = (score, cl)
        out[rid] = (best[1], best[0])
    return out


def test_centroid_sums_exact_integers(spark):
    rows = [
        (0, [0.25, -0.5], 0),
        (1, [0.1365559995174408, 0.75], 0),  # the float grid-edge case
        (2, [-1.0, 0.333333], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {
        (r["c_label"], r["pos"]): r["s"]
        for r in label_centroid_sums(df).collect()
    }
    # floats round-trip through float32 storage; model quantizes the
    # same float32-as-double values Spark sees.
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    want: dict[tuple, int] = {}
    for _, vec, lbl in rows:
        for i, x in enumerate(vec):
            want[(lbl, i)] = want.get((lbl, i), 0) + _q(f32(x))
    assert got == want


def test_classify_matches_python_model(spark):
    import random
    import struct

    rng = random.Random(7)
    raw = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], rng.randrange(3))
        for i in range(60)
    ]
    # Pin float32 storage semantics in the model too.
    rows = [
        (i, [struct.unpack("f", struct.pack("f", x))[0] for x in v], l)
        for i, v, l in raw
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {
        r["vec_id"]: (r["pred_label"], r["score"])
        for r in nearest_centroid_classify(df).collect()
    }
    want = _model(rows)
    assert set(got) == set(want)
    for rid in want:
        assert got[rid][0] == want[rid][0], rid
        assert got[rid][1] == want[rid][1], rid  # bit-identical doubles


def test_split_learn_apply_and_tie_break(spark):
    # Learn centroids on a labeled frame, classify an unlabeled one.
    train = spark.createDataFrame(
        [(0, [1.0, 0.0], 5), (1, [0.0, 1.0], 2)],
        "vec_id long, embedding array<float>, label int",
    )
    test = spark.createDataFrame(
        # equidistant from both centroids -> tie -> smallest label (2)
        [(10, [0.5, 0.5], None), (11, [0.9, 0.1], None)],
        "vec_id long, embedding array<float>, label int",
    )
    cents = label_centroid_sums(train)
    out = {
        r["vec_id"]: r["pred_label"]
        for r in nearest_centroid_classify(test, centroids=cents).collect()
    }
    assert out[10] == 2  # tie broken to the smallest label
    assert out[11] == 5
