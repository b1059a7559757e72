"""Embedding quantization: the compression step an embedding corpus
needs before ANN serving at 100 TB (float32 vectors are 4·d bytes; int8
cuts memory 4×, PQ codes cut it ~32×).

Two tiers:

* Scalar int8 (this module, ``quantize_embeddings_int8``): per-vector
  symmetric quantization — scale by 127/max|v|, round to nearest int.
  MAP-ONLY: every output derives from the row's own array via Catalyst
  higher-order functions (``transform``/``aggregate``/``array_max``) —
  no shuffle, no Python, whole-stage codegen.  The arithmetic uses only
  IEEE-exact double ops (mul/div/add/abs/floor), so a DuckDB oracle
  mirroring the same formulas reproduces every output bit-for-bit —
  quantization is fully value-hash checkable, not rows-only.

* Product quantization (``pq.py``): sub-vector k-means codebooks for
  the ~32× regime, gated by an ADC-recall check (iterative training —
  no SQL twin, same class as IVF).

Reference parity: the reference engine has no vector surface at all —
this is part of the LLM-pipeline extension the driver brief demands.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Formula text shared by the Spark plan and the DuckDB oracle: both
# engines must execute the SAME sequence of IEEE double operations for
# the value hashes to agree (mul/div/add/abs/floor are exactly
# specified by IEEE 754; transcendentals would not be portable).


def quantize_embeddings_int8(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector symmetric int8 quantization.

    Output: (id, n_dims, scale_u, q) where q is the int8 code array
    (stored as array<int> — Spark has no int8 array), and
    ``scale_u = floor(1e6 · max|v|)`` is the integerized scale the
    dequantizer needs (v ≈ q · max|v| / 127).  All-zero vectors encode
    to all-zero codes with scale 0.  Map-only, shuffle-free."""
    e = f"transform({vec_col}, v -> cast(v AS double))"
    ma = f"array_max(transform({e}, v -> abs(v)))"
    q = (
        f"CASE WHEN {ma} = 0.0D THEN transform({e}, v -> 0) "
        f"ELSE transform({e}, v -> cast(floor(v * (127.0D / {ma}) + 0.5D) AS int)) END"
    )
    return emb.select(
        F.col(id_col),
        F.size(vec_col).cast("long").alias("n_dims"),
        F.expr(f"cast(floor({ma} * 1000000.0D) AS bigint)").alias("scale_u"),
        F.expr(q).alias("q"),
    )


def quantize_stats_int8(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Quantization audit row per vector — the numbers a pipeline
    asserts before swapping the float corpus for codes.

    (id, n_dims, scale_u, sum_q, sum_abs_q, max_err_u): code sums catch
    sign/round bugs; ``max_err_u = floor(1e9 · max|v − q·max|v|/127|)``
    is the reconstruction error, bounded by scale/254 for a correct
    quantizer.  Same map-only shape as the quantizer; every column is
    integerized so the DuckDB twin hash-matches exactly."""
    e = f"transform({vec_col}, v -> cast(v AS double))"
    ma = f"array_max(transform({e}, v -> abs(v)))"
    qv = f"floor(v * (127.0D / {ma}) + 0.5D)"
    err = f"abs(v - {qv} * {ma} / 127.0D)"
    zero = f"{ma} = 0.0D"
    return emb.select(
        F.col(id_col),
        F.size(vec_col).cast("long").alias("n_dims"),
        F.expr(f"cast(floor({ma} * 1000000.0D) AS bigint)").alias("scale_u"),
        F.expr(
            f"CASE WHEN {zero} THEN 0L ELSE "
            f"aggregate({e}, 0L, (a, v) -> a + cast({qv} AS bigint)) END"
        ).alias("sum_q"),
        F.expr(
            f"CASE WHEN {zero} THEN 0L ELSE "
            f"aggregate({e}, 0L, (a, v) -> a + abs(cast({qv} AS bigint))) END"
        ).alias("sum_abs_q"),
        F.expr(
            f"CASE WHEN {zero} THEN 0L ELSE "
            f"cast(floor(array_max(transform({e}, v -> {err})) * 1000000000.0D) AS bigint) END"
        ).alias("max_err_u"),
    )


def standardize_embeddings(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1_000_000,
    out_col: str = "z",
) -> DataFrame:
    """Per-DIMENSION z-score standardization (feature scaling) on the
    integer grid — the preprocessing step before distance-based ops
    when dimensions carry different variances.

    Determinism: components quantize to ``floor(x·scale)`` int64 FIRST,
    so the per-dimension moments S_d = Σq and SS_d = Σq² are exact
    integers in any reduction order (SS accumulates in decimal(38,0) so
    it cannot wrap at corpus scale), and

        z = (N·q − S_d) / sqrt(N·SS_d − S_d²)
          = (q − μ_d) / σ_d   exactly (the N's cancel),

    with one correctly-rounded int→double conversion on each side of
    the divide — bit-identical across engines.  Zero-variance
    dimensions standardize to 0.0 by contract.

    Scale shape: ONE posexplode + groupBy(pos) whose shuffle is bounded
    by dim rows per map task (map-side partials); the dim-row stats are
    the legitimate tiny collect, and the apply pass is MAP-ONLY against
    literal arrays — the corpus never shuffles.
    """
    q = F.transform(
        F.col(vec_col), lambda x: F.floor(x * F.lit(float(scale))).cast("long")
    )
    flat = emb.select(F.posexplode(q).alias("pos", "q"))
    stats = flat.groupBy("pos").agg(
        F.sum("q").alias("s"),
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("ss"),
        F.count(F.lit(1)).alias("n"),
    )
    rows = {int(r["pos"]): (int(r["s"]), int(r["ss"]), int(r["n"])) for r in stats.collect()}
    dim = 1 + max(rows)
    n = rows[0][2]
    sums = [rows[p][0] for p in range(dim)]
    # Exact integer radicand (Python ints), ONE conversion to double,
    # one IEEE sqrt — mirrors DuckDB's sqrt(CAST(hugeint AS DOUBLE)).
    dens = [
        math.sqrt(float(n * ss - s * s)) for (s, ss, _n) in (rows[p] for p in range(dim))
    ]
    s_arr = F.array(*[F.lit(s) for s in sums])
    d_arr = F.array(*[F.lit(d) for d in dens])
    z = F.transform(
        q,
        lambda x, i: F.when(F.element_at(d_arr, i + 1) == F.lit(0.0), F.lit(0.0)).otherwise(
            (F.lit(n) * x - F.element_at(s_arr, i + 1)).cast("double")
            / F.element_at(d_arr, i + 1)
        ),
    )
    return emb.withColumn(out_col, z)
