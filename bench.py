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
    for name in HEADLINE:
        fn = QUERIES[name]
        best = -1.0
        for rep in range(reps):
            if rep:
                # Fresh-cache semantics per rep, matching BASELINE.md's
                # min-over-fresh-sessions definition: without this, rep 2
                # would reuse rep 1's scoped operator caches.
                spark.catalog.clearCache()
            t0 = time.time()
            try:
                fn(spark, sf_dir).count()
                dt = round(time.time() - t0, 3)
                best = dt if best < 0 else min(best, dt)
            except Exception as e:  # keep the bench line parseable no matter what
                print(f"bench error in {name}: {e}", file=sys.stderr)
                # A query that fails any rep (fresh-cache reps included)
                # is failed, not "fast": discard earlier reps' timings.
                best = -1.0
                break
        timings[name] = best

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
