"""Nearest-centroid classification over an embedding column.

The classic Rocchio classifier as a data-pipeline operator: per-label
centroids learned from the corpus itself (one elementwise sum per
label), then every vector scored against each centroid by cosine and
assigned the argmax label.  Used in curation pipelines to propagate a
small set of trusted labels across a large corpus (domain tagging,
quality tiers), and as the cheapest sanity probe of embedding quality
(resubstitution accuracy).

Determinism contract — this operator is fully value-hash oracle-able,
unlike raw float cosine: every component is quantized to an integer
grid (``floor(x * scale)`` as int64) BEFORE any aggregation, so the
per-label sums are exact integers regardless of reduction order, and
cosine needs no centroid division at all (cosine is scale-invariant:
``dot(v, S_l) / |S_l|`` with the raw SUM vector equals the cosine
against the mean).  The only floating-point steps are a single int64 →
double conversion, one IEEE division and one IEEE sqrt per (vector,
label) — all correctly-rounded and engine-independent.

Scale shape (100 TB): the per-label sums are one posexplode +
groupBy(label, pos) whose shuffle carries at most L·dim partial rows
per map task (map-side combine), and the L·dim result is a legitimate
tiny collect — the same O(C·dim) driver artifact as the IVF centroid
table (`similarity.py:_centroid_literals`).  Scoring is then MAP-ONLY:
each row evaluates L dot products against literal arrays inside
whole-stage codegen; the corpus is never shuffled.

Reference parity: the reference engine has no classifier; this extends
its aggregation surface (SlidingAggregation.java:433-536 is its only
numeric kernel) the way a training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["label_centroid_sums", "nearest_centroid_classify"]


def _quantized(vec_col: str, scale: int) -> F.Column:
    """array<long>: floor(x * scale) per component — the exact integer
    grid both engines agree on (float → double promotion, one IEEE
    multiply, floor)."""
    return F.transform(
        F.col(vec_col), lambda x: F.floor(x * F.lit(float(scale))).cast("long")
    )


def label_centroid_sums(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact integer per-label component sums: (label, pos, s).

    posexplode → groupBy(label, pos) — partial aggregation bounds the
    shuffle at L·dim rows per map task.  ``s`` is an exact int64 (at
    dim 64 / scale 1e6 a component sum stays < 2⁶³ up to ~3·10¹² rows
    per label)."""
    flat = df.select(
        F.col(label_col).alias("c_label"),
        F.posexplode(_quantized(vec_col, scale)).alias("pos", "c"),
    )
    return flat.groupBy("c_label", "pos").agg(F.sum("c").alias("s"))


def nearest_centroid_classify(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Assign every row the label of its nearest (cosine) centroid.

    Adds ``pred_label`` (bigint) and ``score`` (double cosine against
    the winning centroid's SUM vector — identical to cosine against
    the mean).  Ties break to the SMALLEST label.  Pass ``centroids``
    (a `label_centroid_sums` frame, e.g. from a labeled subset) to
    classify a different frame than the centroids were learned on;
    default is resubstitution (learn and score on ``df``).
    """
    cent = centroids if centroids is not None else label_centroid_sums(
        df, label_col, vec_col, scale
    )
    # L·dim scalars — the same legitimate tiny collect as the IVF
    # centroid table; scoring below stays map-only because of it.
    rows = cent.collect()
    by_label: dict[int, dict[int, int]] = {}
    for r in rows:
        by_label.setdefault(int(r["c_label"]), {})[int(r["pos"])] = int(r["s"])
    dim = 1 + max(p for comps in by_label.values() for p in comps)

    qv = _quantized(vec_col, scale)
    scored = []
    for lbl in sorted(by_label):
        comps = by_label[lbl]
        svec = [comps.get(p, 0) for p in range(dim)]
        # Exact integer norm² first (Python ints are arbitrary
        # precision), ONE correctly-rounded conversion to double —
        # matches DuckDB's CAST(SUM(s*s) AS DOUBLE) over its exact
        # hugeint accumulator.
        n2 = float(sum(c * c for c in svec))
        lit = F.array(*[F.lit(c) for c in svec])
        # Accumulate the dot in DECIMAL(38,0): component sums s_j grow
        # with the corpus, so c_j*s_j summed over dims wraps int64 from
        # ~1e5 rows per label — the DuckDB twin is HUGEINT-exact, and
        # exact==exact keeps the hash contract at any scale.
        d = F.aggregate(
            F.zip_with(
                qv, lit,
                lambda a, b: a.cast("decimal(38,0)") * b.cast("decimal(38,0)"),
            ),
            F.lit(0).cast("decimal(38,0)"),
            lambda acc, x: acc + x,
        )
        score = d.cast("double") / F.sqrt(F.lit(n2))
        scored.append(
            F.struct(score.alias("s"), F.lit(-lbl).cast("long").alias("nl"))
        )
    best = F.array_max(F.array(*scored))
    return df.withColumn("pred_label", -best["nl"]).withColumn("score", best["s"])
