"""Property-based checks for the round-6 operators: each agrees with a
pure-Python brute-force model on arbitrary hypothesis-generated inputs.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from uw_mapreduce_spark.operators.quantize import quantize_embeddings_int8
from uw_mapreduce_spark.operators.sampling import mixture_sample, pps_sample

_SETTINGS = settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)


@_SETTINGS
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_quantizer_matches_python_model(spark, vecs):
    """Codes and scale must equal the same formula computed in pure
    Python (float32 ingest widened to double, floor(v·127/max + 0.5)),
    and every code must be a valid int8 magnitude."""
    import numpy as np

    rows = [(i, [float(np.float32(x)) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: (r.scale_u, list(r.q)) for r in quantize_embeddings_int8(df).collect()}
    for i, v in rows:
        ma = max(abs(x) for x in v)
        want_scale = math.floor(ma * 1_000_000.0)
        if ma == 0.0:
            want_q = [0] * len(v)
        else:
            want_q = [math.floor(x * (127.0 / ma) + 0.5) for x in v]
        assert got[i] == (want_scale, want_q)
        assert all(-127 <= c <= 127 for c in got[i][1])


@_SETTINGS
@given(
    weights=st.lists(st.integers(1, 500), min_size=2, max_size=40),
    k=st.integers(1, 20),
)
def test_pps_sample_matches_python_model(spark, weights, k):
    """The integer draw is a pure function: the kept set must equal the
    same md5 cross-multiply computed in Python, and certainty rows
    (k·w ≥ W) are always kept."""
    import hashlib

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = sorted(r.doc_id for r in pps_sample(df, "w", k, "doc_id").collect())
    W = sum(weights)
    want = sorted(
        i
        for i, w in rows
        if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) * W
        < k * w * (1 << 32)
    )
    assert got == want
    assert all(i in got for i, w in rows if k * w >= W)


@_SETTINGS
@given(
    langs=st.lists(st.sampled_from(["a", "b", "c"]), min_size=3, max_size=60),
    t_a=st.integers(0, 1000),
)
def test_mixture_sample_monotone_in_target(spark, langs, t_a):
    """Raising one group's target weight keeps a SUPERSET of the rows
    kept at the lower weight (the integer draw is monotone in t), and
    groups with weight 0 never emit."""
    rows = [(i, g) for i, g in enumerate(langs)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    lo = {"a": t_a, "b": 200, "c": 0}
    hi = {"a": min(1000, t_a + 300), "b": 200, "c": 0}
    kept_lo = {r.doc_id for r in mixture_sample(df, "lang", lo, 10, "doc_id").collect()}
    kept_hi = {r.doc_id for r in mixture_sample(df, "lang", hi, 10, "doc_id").collect()}
    assert kept_lo <= kept_hi
    assert not any(langs[i] == "c" for i in kept_hi)
