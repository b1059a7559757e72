"""Scalar int8 embedding quantization (`operators/quantize.py`):
round-trip error bounds, exact codes on a known vector, zero-vector
handling, and the map-only (shuffle-free) plan shape.
"""

from __future__ import annotations

from uw_mapreduce_spark.operators.quantize import (
    quantize_embeddings_int8,
    quantize_stats_int8,
)
from uw_mapreduce_spark.sources.tables import load_table


def test_known_vector_codes(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in quantize_embeddings_int8(df).collect()}
    # scale = max|v| = 1.0 → q = round(127 * v)
    assert rows[1].q == [127, -63, 32, 0]  # floor(x+0.5): -63.5→-63, 31.75+0.5→32
    assert rows[1].scale_u == 1_000_000
    assert rows[2].q == [0, 0, 0, 0] and rows[2].scale_u == 0


def test_reconstruction_error_bounded(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    rows = quantize_stats_int8(emb).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_dims == 64
        if r.scale_u == 0:
            assert r.max_err_u == 0
            continue
        # |v - q·scale/127| ≤ scale/254 for round-to-nearest (+1 for the
        # floor() integerization of the µ-units).
        assert r.max_err_u <= r.scale_u * 1000 // 254 + 1
        assert r.sum_abs_q >= abs(r.sum_q)


def test_quantizer_plan_is_shuffle_free(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    plan = quantize_stats_int8(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_standardize_matches_python_model(spark):
    import math
    import struct

    import random

    from uw_mapreduce_spark.operators.quantize import standardize_embeddings

    rng = random.Random(3)
    rows = [
        (i, [struct.unpack("f", struct.pack("f", rng.uniform(-1, 1)))[0] for _ in range(5)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: list(r["z"]) for r in standardize_embeddings(df).collect()}

    qs = {i: [math.floor(x * 1e6) for x in v] for i, v in rows}
    n = len(rows)
    dim = 5
    for d in range(dim):
        s = sum(qs[i][d] for i, _ in rows)
        ss = sum(qs[i][d] ** 2 for i, _ in rows)
        den = math.sqrt(float(n * ss - s * s))
        for i, _ in rows:
            want = 0.0 if den == 0.0 else float(n * qs[i][d] - s) / den
            assert got[i][d] == want, (i, d)


def test_standardize_zero_variance_dim_is_zero(spark):
    from uw_mapreduce_spark.operators.quantize import standardize_embeddings

    df = spark.createDataFrame(
        [(0, [0.5, 1.0]), (1, [0.5, 2.0]), (2, [0.5, 3.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: list(r["z"]) for r in standardize_embeddings(df).collect()}
    assert all(v[0] == 0.0 for v in out.values())      # constant dim -> 0
    assert out[0][1] < 0.0 < out[2][1]                  # varying dim ordered


def test_percentile_rank_face_properties(spark, sf_small):
    """Per dimension: permille ranks are a permutation-invariant
    rescaling — min 0, max = 1000*(N-1)//N, monotone in the value."""
    from uw_mapreduce_spark.plans.catalog import QUERIES

    out = QUERIES["percentile_rank_embeddings"](spark, sf_small)
    rows = out.collect()
    n = len({r["vec_id"] for r in rows})
    per_pos = {}
    for r in rows:
        per_pos.setdefault(r["pos"], []).append(r["pr_permille"])
    for pos, prs in per_pos.items():
        assert min(prs) == 0
        assert max(prs) == (1000 * (n - 1)) // n
        assert len(prs) == n
