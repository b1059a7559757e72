"""Round-7 hypothesis properties: the scalable ntile closed form, the
DECIMAL(38) sampler compare at weights that would wrap int64, and the
MAD rank-position medians — each against an exact pure-Python model.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

_SETTINGS = dict(
    deadline=None,
    max_examples=12,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    n=st.integers(min_value=1, max_value=60),
    k=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_ntile_scalable_equals_window_ntile(spark, n, k, seed):
    """ntile_scalable ≡ F.ntile over a fully tie-broken order for every
    (n, k) — including n < k (empty small buckets) and n % k != 0
    (ragged bucket sizes), where the closed form's two branches meet."""
    import random

    from uw_mapreduce_spark.operators.rank import ntile_scalable

    rng = random.Random(seed)
    rows = [(i, rng.randrange(0, 10)) for i in range(n)]  # duplicate keys likely
    df = spark.createDataFrame(rows, "id long, v long")
    w = Window.orderBy("v", "id")
    expected = {
        (r["id"], r["t"])
        for r in df.select("id", F.ntile(k).over(w).cast("long").alias("t")).collect()
    }
    got = {
        (r["id"], r["tile"])
        for r in ntile_scalable(df, ["v", "id"], k).select("id", "tile").collect()
    }
    assert got == expected


@settings(**_SETTINGS)
@given(
    weights=st.lists(
        st.integers(min_value=1, max_value=1 << 40), min_size=1, max_size=30
    ),
    k=st.integers(min_value=1, max_value=50),
)
def test_pps_sample_decimal_compare_never_wraps(spark, weights, k):
    """The DECIMAL(38,0) keep decision must equal exact Python big-int
    arithmetic even when u32·ΣW and k·w·2³² far exceed int64 (weights
    up to 2⁴⁰ here — the pre-fix int64 compare silently wrapped)."""
    from uw_mapreduce_spark.operators.sampling import pps_sample

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "id long, w long")
    total = sum(weights)

    def u32(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)

    expected = {i for i, w in rows if u32(i) * total < k * w * (1 << 32)}
    got = {r["id"] for r in pps_sample(df, "w", k, "id").collect()}
    assert got == expected


@settings(**_SETTINGS)
@given(
    values=st.lists(
        st.integers(min_value=-(10**6), max_value=10**6), min_size=1, max_size=40
    )
)
def test_mad_rank_position_medians_match_python(spark, values):
    """The catalog's MAD pipeline semantics — lower-rank median, MAD of
    absolute deviations, 3·MAD outlier count — against a brute-force
    Python model (duplicates included: the histogram path must weight
    repeated values by their counts, not collapse them)."""
    from uw_mapreduce_spark.operators.sampling import order_statistic_bounds

    df = spark.createDataFrame(
        [("t", v) for v in values], "event_type string, v_u long"
    )
    sv = sorted(values)
    med = sv[(len(sv) - 1) // 2]
    ads = sorted(abs(v - med) for v in values)
    mad = ads[(len(ads) - 1) // 2]

    got_med = order_statistic_bounds(df, ["event_type"], "v_u", 500, 500).collect()[0]
    assert got_med["lo"] == med
    dev = df.withColumn("ad", F.abs(F.col("v_u") - F.lit(med)))
    got_mad = order_statistic_bounds(dev, ["event_type"], "ad", 500, 500).collect()[0]
    assert got_mad["lo"] == mad
