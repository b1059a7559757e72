"""Physical-plan regression gates.

PLANS.md documents how each operator family plans; these tests ENFORCE
the load-bearing properties so a refactor cannot silently regress them:
filters/projection pushed to the parquet scan, bloom pruning staying
map-only, explicit broadcasts surviving, the sessionize two-window
pipeline keeping its single exchange, and Z-order clustering actually
range-partitioning.  Assertions stick to properties that are stable
pre-AQE (explicit hints, scan pushdown, exchange counts of fixed
shapes) — AQE-dependent join picks are deliberately not pinned.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from uw_mapreduce_spark.plans.catalog import QUERIES
from uw_mapreduce_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_scan_pushes_filter_and_prunes_columns(spark, sf_small):
    plan = _plan(QUERIES["q1_pricing_summary"](spark, sf_small))
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1][:200]
    # Projection pruning: the scan schema must not include unused cols.
    read_schema = plan.split("ReadSchema", 1)[1][:400]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema


def test_bloom_prune_is_map_only(spark, sf_small):
    from uw_mapreduce_spark.operators.bloomjoin import bloom_build, bloom_prune

    keys = (
        load_table(spark, sf_small, "orders")
        .where(F.col("o_totalprice") > 450000)
        .select("o_orderkey")
    )
    words = bloom_build(keys, "o_orderkey")
    pruned = bloom_prune(load_table(spark, sf_small, "lineitem"), "l_orderkey", words)
    plan = _plan(pruned)
    # No SHUFFLE of the probe side: the only exchange is the one-row
    # broadcast of the word array; the bit-test filter fuses into the
    # probe scan stage.
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert plan.count("BroadcastExchange") == 1
    assert "xxhash64" in plan


def test_zorder_clustering_plans_a_range_exchange(spark):
    from uw_mapreduce_spark.operators.zorder import zorder_by

    df = spark.range(1000).select(
        F.col("id").alias("x"), (F.col("id") * 7 % 1000).alias("y")
    )
    plan = _plan(zorder_by(df, "x", "y", bits=8, n_partitions=8))
    assert "rangepartitioning" in plan.lower()


def test_sessionize_pipelines_both_windows_over_one_exchange(spark, sf_small):
    plan = _plan(QUERIES["sessionize_events_batch"](spark, sf_small))
    # Two window operators + the session aggregate all cluster by
    # user_id: one shuffle feeds the whole pipeline.
    assert plan.count("Exchange") == 1


def test_q7_explicit_broadcasts_survive(spark, sf_small):
    plan = _plan(QUERIES["q7_volume_shipping"](spark, sf_small))
    assert plan.count("BroadcastHashJoin") >= 2  # hinted supp + nation sides
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_knn_bruteforce_never_shuffles_the_corpus(spark, sf_small):
    plan = _plan(QUERIES["knn_cosine_top5"](spark, sf_small))
    # The only exchange allowed is the top-k window's shuffle of scored
    # rows keyed by query; the corpus side joins via broadcast.
    assert "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_plan_digest_counts_join_strategies(spark, sf_small):
    from uw_mapreduce_spark.inspect import plan_digest

    d = plan_digest(QUERIES["q9_product_type_profit"](spark, sf_small), execute=True)
    assert d["broadcast_hash_joins"] >= 2     # part + supplier-nation hints
    assert d["nested_loop_joins"] == 0
    assert d["scans"] >= 3
    assert d["scans_with_pushed_filters"] >= 1  # the p_name LIKE pushdown
    assert d["codegen_spans"] >= 1            # only visible in the final plan


def test_schema_drift_classifies_changes(spark):
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from uw_mapreduce_spark.inspect import schema_drift

    old = StructType([StructField("a", LongType()), StructField("b", StringType())])
    new = StructType([StructField("b", LongType()), StructField("c", StringType())])
    assert schema_drift(old, new) == {
        "added": ["c"],
        "removed": ["a"],
        "type_changed": [("b", "string", "bigint")],
    }


def test_mixture_sample_never_reshuffles_the_corpus(spark, sf_small):
    """The mixture draw is a codegen filter over the scan plus two
    broadcast joins (targets, group counts): no Exchange may carry the
    corpus — the only exchanges allowed are the broadcast ones and the
    group-count aggregate's own (tiny) shuffle."""
    from uw_mapreduce_spark.operators.sampling import mixture_sample

    docs = load_table(spark, sf_small, "documents")
    plan = _plan(
        mixture_sample(
            docs, "lang", {"en": 600, "de": 100, "es": 100, "fr": 100, "zh": 100},
            200, "doc_id",
        )
    )
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_attribution_has_no_cartesian_product(spark, sf_small):
    """The 24 h interval join must plan as an equi-join on user_id with
    the time bounds as residual predicates — never a cross product."""
    plan = _plan(QUERIES["attribution_linear_events"](spark, sf_small))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_ivfadc_broadcasts_all_small_sides(spark, sf_small):
    """IVF+PQ serving: centroids/LUT/probe-map are all broadcast — the
    code table itself must never be broadcast-joined as the big side of
    a nested loop, and no cartesian appears anywhere."""
    from uw_mapreduce_spark.operators.pq import ivf_pq_topk, pq_train
    from uw_mapreduce_spark.operators.similarity import kmeans_centroids

    emb = load_table(spark, sf_small, "embeddings")
    cb = pq_train(emb, m=8, k=16, iterations=0)
    cents = kmeans_centroids(emb, 8, iterations=0)
    plan = _plan(
        ivf_pq_topk(emb, emb.where(F.col("vec_id") < 3), cb, cents, k=5, m=8,
                    n_probes=2, n_assign=1)
    )
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_partitioned_layout_prunes_partitions_at_scan(spark, sf_small, tmp_path):
    """Directory-partitioned writes + a partition-key filter must prune
    at the SCAN (PartitionFilters in the plan and only the matching
    partition's files read) — the single biggest lever on a 100 TB
    table, asserted end-to-end through write_table."""
    from uw_mapreduce_spark.sources.sinks import write_table
    from uw_mapreduce_spark.sources.tables import load_table

    t = str(tmp_path / "events_by_type")
    write_table(load_table(spark, sf_small, "events"), t, partition_by=["event_type"])
    q = spark.read.parquet(t).where(F.col("event_type") == "click")
    plan = _plan(q)
    pf = plan.split("PartitionFilters", 1)[1][:160]
    assert "event_type" in pf
    # And the pruning is real: the filtered scan reads fewer files than
    # the full-table scan.
    n_all = spark.read.parquet(t).select(F.input_file_name()).distinct().count()
    n_clicked = q.select(F.input_file_name()).distinct().count()
    assert 0 < n_clicked < n_all


def test_session_timezone_pinned_utc(spark):
    """cast(ts AS DATE) is session-tz-dependent in Spark but fixed in
    DuckDB; every calendar-bucketed oracle depends on this pin staying
    put."""
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_kfold_cv_scores_in_one_corpus_scan(spark, sf_small):
    """The fold-tag when() chain must keep k-fold CV at ONE parquet
    scan of the corpus (the old per-fold-filter plan scanned it F
    times)."""
    plan = _plan(QUERIES["kfold_cv_embeddings"](spark, sf_small))
    assert plan.count("Scan parquet") == 1, plan.count("Scan parquet")


def test_heavy_hitters_only_wide_exchange_is_candidate_verify(spark, sf_small):
    """The MG candidate pass is mapInPandas with NO exchange upstream;
    the verify groupBy over candidate-filtered rows is the single wide
    shuffle (plus bounded 1-row/broadcast exchanges)."""
    plan = _plan(QUERIES["heavy_hitters_trigrams_documents"](spark, sf_small))
    wide = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
    assert wide <= 2, wide  # candidate distinct + verify groupBy
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan


def test_centroid_scoring_is_map_only(spark, sf_small):
    """binary_centroid_scores: after the centroid collect, scoring must
    not shuffle the corpus — literal-array dot product in a project."""
    from uw_mapreduce_spark.operators.evaluation import binary_centroid_scores

    emb = load_table(spark, sf_small, "embeddings")
    plan = _plan(binary_centroid_scores(emb, pos_label=0))
    assert "Exchange" not in plan
