"""Exact integer-grid Lloyd k-means — clustering that value-hashes.

`similarity.kmeans_centroids` (the IVF build) is deterministic within
Spark but keeps float centroids, so no other engine can replay it
bit-for-bit.  This operator makes the whole Lloyd loop EXACT integer
arithmetic, the same contract as the centroid classifier:

- components on the int64 grid (``floor(x·10⁶)``),
- centroids as integer grids too: ``μ' = S DIV n`` (trunc toward zero
  — identical in Spark DECIMAL DIV, DuckDB HUGEINT ``//``, Python),
- assignment by exact int64 squared L2 distance Σ(c−μ)², ties to the
  smallest centroid id,
- seeds are the k corpus vectors with the smallest portable md5-derived
  id hash (the repo's `split.hash_permille` idiom — a deterministic
  uniform draw both engines reproduce), tie-broken by id,
- an emptied cluster keeps its previous centroid.

Every quantity either engine materializes is an integer, so a DuckDB
twin unrolls the same iterations as CTEs and hash-matches the final
centroid grid — a fully value-hash-oracled CLUSTERING face, which
float k-means cannot be.

Scale shape (100 TB): per iteration the assignment is MAP-ONLY (the
k·dim centroid grid rides as literal arrays inside codegen — the
classify.py pattern), and the update is one posexplode →
groupBy(cluster, pos) whose shuffle is bounded at k·dim cells per map
task.  The driver holds k·dim ints — the same legitimate tiny collect
as the IVF centroid table.

Reference parity: the reference engine has no clustering surface; this
extends its aggregation layer (SlidingAggregation.java:433-536) with
the unsupervised primitive curation pipelines use for corpus
stratification and diversity sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import persist_scoped
from .classify import _quantized

__all__ = ["kmeans_lloyd_exact"]


def _trunc_div(a: int, b: int) -> int:
    return (abs(a) // b) * (1 if a >= 0 else -1)


def kmeans_lloyd_exact(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """(cent_id, pos, mu, n_members) — the integer centroid grid after
    ``iters`` exact Lloyd steps, with each centroid's final assignment
    count (0 if it emptied; it then keeps its previous grid)."""
    spark = df.sparkSession
    # the quantized frame feeds the seed draw plus one stats collect per
    # iteration — cache it so the corpus is read and floor-quantized
    # once, not iters+1 times (the _ranged_with_offsets discipline).
    q = persist_scoped(
        df.select(F.col(id_col).alias("_id"), _quantized(vec_col, scale).alias("_c")),
        "kmeans",
    )
    h = (
        F.conv(F.substring(F.md5(F.col("_id").cast("string")), 1, 12), 16, 10)
        .cast("long")
        .alias("_h")
    )
    seed_rows = (
        q.select("_id", "_c", h)
        .orderBy("_h", "_id")
        .limit(k)
        .collect()
    )
    cents: dict[int, list[int]] = {
        i + 1: [int(x) for x in r["_c"]] for i, r in enumerate(seed_rows)
    }
    dim = len(next(iter(cents.values())))
    sizes: dict[int, int] = {c: 0 for c in cents}

    for _ in range(iters):
        scored = []
        for cid in sorted(cents):
            lit = F.array(*[F.lit(v) for v in cents[cid]])
            d2 = F.aggregate(
                F.zip_with(F.col("_c"), lit, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            scored.append(F.struct(d2.alias("d"), F.lit(cid).alias("c")))
        best = F.array_min(F.array(*scored))["c"]
        stats = (
            q.withColumn("_k", best)
            .select("_k", F.posexplode("_c").alias("pos", "c"))
            .groupBy("_k", "pos")
            .agg(
                F.sum("c").cast("long").alias("s"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
            .collect()
        )
        sums: dict[int, list[int]] = {}
        sizes = {c: 0 for c in cents}
        for r in stats:
            cid = int(r["_k"])
            sums.setdefault(cid, [0] * dim)[int(r["pos"])] = int(r["s"])
            sizes[cid] = int(r["n"])
        for cid in cents:
            n = sizes.get(cid, 0)
            if n > 0:
                cents[cid] = [_trunc_div(s, n) for s in sums[cid]]
    return spark.createDataFrame(
        [
            (cid, p, cents[cid][p], sizes.get(cid, 0))
            for cid in sorted(cents)
            for p in range(dim)
        ],
        "cent_id long, pos int, mu long, n_members long",
    )
