"""Weighted PPS sampling (`operators/sampling.pps_sample`): expected
size, weight bias (certainty rows always kept), and determinism of the
integer-exact md5 draw.
"""

from __future__ import annotations


def test_pps_sample_weighted_and_deterministic(spark, sf_small):
    from pyspark.sql import functions as F

    from uw_mapreduce_spark.operators.sampling import pps_sample
    from uw_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    n = docs.count()
    W = docs.agg(F.sum(F.col("n_chars").cast("long"))).collect()[0][0]
    k = 50
    kept = pps_sample(docs, "n_chars", k, "doc_id")
    ids1 = sorted(r.doc_id for r in kept.select("doc_id").collect())
    # Expected size ~k: allow generous concentration slack.
    assert k // 2 <= len(ids1) <= 2 * k
    assert len(ids1) < n
    # Certainty rows (k·w >= W) are always kept.
    certain = [
        r.doc_id
        for r in docs.where(F.lit(k) * F.col("n_chars").cast("long") >= W).collect()
    ]
    assert set(certain) <= set(ids1)
    # Pure function of the data: identical on re-run.
    ids2 = sorted(
        r.doc_id
        for r in pps_sample(docs, "n_chars", k, "doc_id").select("doc_id").collect()
    )
    assert ids1 == ids2


def test_mixture_sample_hits_target_proportions(spark, sf_small):
    from pyspark.sql import functions as F

    from uw_mapreduce_spark.operators.sampling import mixture_sample
    from uw_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    targets = {"en": 600, "de": 100, "es": 100, "fr": 100, "zh": 100}
    kept = mixture_sample(docs, "lang", targets, 200, "doc_id")
    by_lang = {
        r.lang: r.n
        for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n = sum(by_lang.values())
    # ~200 rows total, en the clear majority (60% target vs ~50% corpus
    # share), every targeted language represented.
    assert 140 <= n <= 260
    assert set(by_lang) == set(targets)
    assert by_lang["en"] > max(v for k, v in by_lang.items() if k != "en") * 2
    # Deterministic.
    again = mixture_sample(docs, "lang", targets, 200, "doc_id")
    assert sorted(r.doc_id for r in kept.select("doc_id").collect()) == sorted(
        r.doc_id for r in again.select("doc_id").collect()
    )


def test_temperature_mixture_flattens_shares(spark):
    """α=0.5 smoothing must upsample the rare group RELATIVE to its
    natural share: kept-share(rare)/corpus-share(rare) > 1 >
    kept-share(big)/corpus-share(big)."""
    from uw_mapreduce_spark.operators.sampling import temperature_mixture_sample

    rows = [(i, "big") for i in range(900)] + [(i + 10_000, "rare") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    kept = temperature_mixture_sample(df, "g", 300, "doc_id")
    counts = {r["g"]: r["n"] for r in kept.groupBy("g").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    # targets: r_big=30, r_rare=10, S=40 -> quota big ~225, rare ~75.
    # Natural shares are 90%/10%; smoothed draw must lift rare's share
    # well above 10% of the sample.
    share_rare = counts["rare"] / (counts["big"] + counts["rare"])
    assert share_rare > 0.15
    # determinism: same call twice -> identical kept set
    a = {r["doc_id"] for r in kept.collect()}
    b = {r["doc_id"] for r in temperature_mixture_sample(df, "g", 300, "doc_id").collect()}
    assert a == b


def test_systematic_sample_even_spread_and_determinism(spark):
    from uw_mapreduce_spark.operators.sampling import systematic_sample

    df = spark.createDataFrame([(i,) for i in range(100)], "v long")
    kept = sorted(r["v"] for r in systematic_sample(df, ["v"], 10).collect())
    assert kept == list(range(0, 100, 10))
    off = sorted(r["v"] for r in systematic_sample(df, ["v"], 10, offset=3).collect())
    assert off == list(range(3, 100, 10))
    again = sorted(
        r["v"] for r in systematic_sample(df.repartition(7), ["v"], 10).collect()
    )
    assert again == kept  # partitioning-invariant
