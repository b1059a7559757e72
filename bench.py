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

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        try:
            fn(spark, sf_dir).count()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # keep the bench line parseable no matter what
            timings[name] = -1.0
            print(f"bench error in {name}: {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "headline-suite wall-clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
