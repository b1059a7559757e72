"""Session-3 face invariants that the value-hash oracles don't state
explicitly: the growth-accounting DAU identity, Spearman vs a brute
midrank model, Neyman apportionment totals, the conformal order
statistic, and the v5 subset discipline."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from uw_mapreduce_spark.session import get_spark

    return get_spark(
        app_name="s3-invariants", master="local[4]", shuffle_partitions=8
    )


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as e

    return e.queries()


def test_growth_accounting_dau_identity(spark, queries):
    """DAU_d == DAU_{d-1} + new + resurrected − churned, per day."""
    from pyspark.sql import functions as F

    from uw_mapreduce_spark.sources.tables import load_table

    ledger = {
        r["d"]: r
        for r in queries["growth_accounting_events"](spark, SF).collect()
    }
    ev = load_table(spark, SF, "events")
    dau = {
        r["d"]: r["dau"]
        for r in ev.select(F.col("ts").cast("date").alias("d"), "user_id")
        .distinct()
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("dau"))
        .collect()
    }
    days = sorted(dau)
    for prev, cur in zip(days, days[1:]):
        row = ledger[cur]
        assert dau[cur] == dau[prev] + row["new_users"] + row["resurrected"] - (
            ledger[cur]["churned"]
        ), cur
        # retained is the remainder of yesterday's actives
        assert row["retained"] == dau[prev] - row["churned"]


def test_spearman_brute_model(spark):
    """spearman face arithmetic == a pure-Python midrank model."""
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    import duckdb

    xs = [1, 2, 2, 3, 3, 3, 10, 1, 2, 5]
    ys = [5, 4, 4, 3, 9, 2, 1, 5, 3, 2]

    def midranks(v):
        sv = sorted(range(len(v)), key=lambda i: v[i])
        r = [0.0] * len(v)
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and v[sv[j]] == v[sv[i]]:
                j += 1
            avg = (i + j + 1) / 2  # 1-based average rank
            for t in sv[i:j]:
                r[t] = avg
            i = j
        return r

    rx, ry = midranks(xs), midranks(ys)
    n = len(xs)
    hx = [int(2 * r) for r in rx]
    hy = [int(2 * r) for r in ry]
    num = n * sum(a * b for a, b in zip(hx, hy)) - sum(hx) * sum(hy)
    d1 = n * sum(a * a for a in hx) - sum(hx) ** 2
    d2 = n * sum(b * b for b in hy) - sum(hy) ** 2
    import math

    want = math.floor(1_000_000.0 * num / (math.sqrt(d1) * math.sqrt(d2)))

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lineitem AS SELECT * FROM (VALUES "
        + ",".join(f"('A', {x}, {y / 100.0})" for x, y in zip(xs, ys))
        + ") AS t(l_returnflag, l_quantity, l_extendedprice)"
    )
    sql = e.oracle_sql()["spearman_qty_price_lineitem"]
    got = con.execute(sql).fetchall()
    assert got == [("A", n, want)]


def test_neyman_allocation_sums_to_1000(spark, queries):
    out = queries["neyman_allocation_events"](spark, SF).collect()
    assert sum(r["alloc"] for r in out) == 1000
    for r in out:
        assert r["alloc"] >= 0


def test_conformal_threshold_is_kth_order_statistic(spark):
    from pyspark.sql import functions as F

    from uw_mapreduce_spark.plans.catalog_llm import _conformal_parts

    scored, kth, thr = _conformal_parts(spark, SF)
    cal_scores = sorted(
        r["score"] for r in scored.where("is_cal").select("score").collect()
    )
    k = kth.collect()[0]["k"]
    assert thr.collect()[0]["threshold"] == cal_scores[k - 1]


def test_v5_is_subset_of_quality_kept(spark, queries):
    from pyspark.sql import functions as F

    v5 = queries["curation_pipeline_v5"](spark, SF).collect()
    rules = queries["quality_rules_documents"](spark, SF)
    n_quality = rules.where(F.col("keep") == 1).count()
    assert sum(r["n_docs"] for r in v5) <= n_quality


def test_power_iteration_matches_exact_bigint_model(spark):
    """The distributed iterate equals a pure-Python arbitrary-precision
    model EXACTLY (not approximately) — the whole point of the integer
    formulation."""
    import numpy as np

    from uw_mapreduce_spark.operators.pca import (
        power_iteration_top_component,
        rescale_int_vector,
    )
    from uw_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    out = power_iteration_top_component(emb, iters=3).collect()
    got = [0] * len(out)
    for r in out:
        got[r["pos"]] = r["w"]

    mat = [
        [int(x) for x in np.floor(np.asarray(r["embedding"], dtype=np.float64) * 1e6)]
        for r in emb.select("embedding").collect()
    ]
    n, dim = len(mat), len(mat[0])
    w = [1] * dim
    for _ in range(3):
        d = [sum(mat[i][j] * w[j] for j in range(dim)) for i in range(n)]
        u = [sum(mat[i][j] * d[i] for i in range(n)) for j in range(dim)]
        w = rescale_int_vector(u)
    assert got == w


def test_rescale_int_vector_trunc_semantics():
    from uw_mapreduce_spark.operators.pca import rescale_int_vector

    # max has 9 digits, keep 7 -> divide by 10^2
    assert rescale_int_vector([123456789, -987654321]) == [1234567, -9876543]
    assert rescale_int_vector([-7, 3], keep_digits=0) == [0, 0]
    assert rescale_int_vector([0, 0]) == [0, 0]
    # trunc toward zero, not floor: -15 / 10 -> -1
    assert rescale_int_vector([-15, 99999999], keep_digits=7) == [-1, 9999999]


def test_kmeans_exact_partitions_corpus(spark):
    from uw_mapreduce_spark.operators.clustering import kmeans_lloyd_exact
    from uw_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    out = kmeans_lloyd_exact(emb, k=4, iters=2).collect()
    sizes = {r["cent_id"]: r["n_members"] for r in out}
    assert sum(sizes.values()) == emb.count()
    assert len({r["cent_id"] for r in out}) == 4
    dim = len(emb.first()["embedding"])
    assert len(out) == 4 * dim
    again = kmeans_lloyd_exact(emb, k=4, iters=2).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_kmeans_exact_column_vs_posexplode_paths_identical(spark):
    """The column-sum Lloyd update (r11) must be bit-identical to the
    posexplode fallback it replaced below the dim guard — same int64
    cell sums, same trunc-division means."""
    from uw_mapreduce_spark.operators import similarity as sim
    from uw_mapreduce_spark.operators.clustering import kmeans_lloyd_exact
    from uw_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    col_path = kmeans_lloyd_exact(emb, k=4, iters=2).collect()
    old = sim._KMEANS_COLUMN_AGG_MAX_DIM
    try:
        sim._KMEANS_COLUMN_AGG_MAX_DIM = 4  # dim 64 > 4 -> posexplode path
        exp_path = kmeans_lloyd_exact(emb, k=4, iters=2).collect()
    finally:
        sim._KMEANS_COLUMN_AGG_MAX_DIM = old
    assert sorted(map(tuple, col_path)) == sorted(map(tuple, exp_path))


def test_power_iteration_column_vs_posexplode_paths_identical(spark):
    """The column-sum back-projection (r11) must be bit-identical to
    the posexplode fallback below the dim guard — exact decimal sums
    are order-free, so the iterate cannot differ."""
    from uw_mapreduce_spark.operators import similarity as sim
    from uw_mapreduce_spark.operators.pca import power_iteration_top_component
    from uw_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    col_path = power_iteration_top_component(emb, iters=3).collect()
    old = sim._KMEANS_COLUMN_AGG_MAX_DIM
    try:
        sim._KMEANS_COLUMN_AGG_MAX_DIM = 4  # dim 64 > 4 -> posexplode path
        exp_path = power_iteration_top_component(emb, iters=3).collect()
    finally:
        sim._KMEANS_COLUMN_AGG_MAX_DIM = old
    assert sorted(map(tuple, col_path)) == sorted(map(tuple, exp_path))
