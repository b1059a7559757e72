"""Iterative graph algorithms on edge DataFrames.

The LLM-pipeline use case: near-duplicate detection produces PAIRS
(dedup.py, similarity.py), but curation needs CLUSTERS — if A~B and
B~C, all three are one duplicate group even when A~C was never scored.
``connected_components`` collapses the pair graph into components so a
pipeline can keep exactly one representative per group.

Algorithm: iterative min-label propagation (the standard Pregel-style
formulation, same shape as GraphFrames/GraphX CC) with POINTER
DOUBLING: every vertex starts labeled with itself; each round every
vertex takes the minimum of its label, its neighbors' labels, and its
label's label (path halving — ``label(v)`` is a vertex reachable from
``v``, so ``label(label(v))`` is too, and chasing it collapses chains
exponentially).  Converged when no label changes: O(log diameter)
rounds, so even a pathological million-hop duplicate chain fits the
default ``max_iter=25``.  Each round is two joins + one aggregate, all
JVM-side; the label frame is localCheckpointed per round to keep the
lineage flat (an iterative plan would otherwise grow by one join per
round and overwhelm the optimizer).

The driver-side loop-with-convergence-check mirrors the reference's
multi-job orchestration (`SlidingAggregation.java:433-536` chains jobs
and reads a counter between them) — O(1) driver data per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Components of the undirected graph given by ``edges``.

    Returns (v, label): every vertex that appears in an edge, labeled
    with the smallest vertex id reachable from it.  Raises if not
    converged within ``max_iter`` rounds (an O(log diameter) bound
    thanks to pointer doubling).
    """
    both = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    both = both.localCheckpoint(eager=True)  # edges reused every round

    labels = (
        both.select(F.col("a").alias("v")).distinct().withColumn("label", F.col("v"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # neighbor labels: for each edge a->b, b's current label reaches a
        nbr = (
            both.join(labels.withColumnRenamed("v", "b"), "b")
            .groupBy(F.col("a").alias("v"))
            .agg(F.min("label").alias("nbr_min"))
        )
        # pointer doubling: label(label(v)) is reachable from v
        ll = labels.select(
            F.col("v").alias("label"), F.col("label").alias("_ll")
        )
        best = F.least(
            F.col("label"),
            F.coalesce(F.col("nbr_min"), F.col("label")),
            F.coalesce(F.col("_ll"), F.col("label")),
        )
        updated = (
            labels.join(nbr, "v", "left")
            .join(ll, "label", "left")
            .select(
                "v",
                best.alias("label"),
                (best < F.col("label")).alias("_chg"),
            )
        ).localCheckpoint(eager=True)
        changed = updated.where(F.col("_chg")).count()
        labels = updated.drop("_chg")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
