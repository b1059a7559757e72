"""Deterministic hash-based sampling and dataset splitting.

Why next to the RNG samplers (`operators/sampling.py`): Bernoulli and
stratified sampling use engine RNGs — irreproducible across engines and
across reruns with different partitioning.  Corpus work needs the
opposite: a doc's membership in train/val/test (or in a 1%-sample
debugging slice) must be a PURE FUNCTION of its identity, stable under
repartitioning, resharding, and incremental reruns — otherwise eval
splits leak when the pipeline re-executes.  The md5-derived permille
used here is the repo's portable-hash idiom, so the driver's DuckDB
oracle checks membership row-for-row (the RNG samplers can only be
rows-only checked).

All map-only: no shuffle, fuses into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_permille(id_col: Column, salt: str = "") -> Column:
    """Deterministic uniform 0..999 from a row identity: md5 of the
    (salted) id, first 12 hex chars as a 48-bit integer, mod 1000.
    Changing ``salt`` draws an independent assignment — the knob for
    uncorrelated repeated samples."""
    key = F.concat(F.lit(salt), id_col.cast("string"))
    return (F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long") % 1000).alias(
        "permille"
    )


def hash_sample(df: DataFrame, id_col: str, keep_permille: int,
                salt: str = "") -> DataFrame:
    """Keep ~keep_permille/1000 of rows, deterministically in the id."""
    return df.where(hash_permille(F.col(id_col), salt) < keep_permille)


def hash_split(df: DataFrame, id_col: str, splits: list[tuple[str, int]],
               salt: str = "", split_col: str = "split") -> DataFrame:
    """Assign each row to one named split by cumulative permille
    ranges, e.g. [('train', 900), ('val', 50), ('test', 50)].  Weights
    must sum to 1000 so every row lands somewhere."""
    if sum(w for _, w in splits) != 1000:
        raise ValueError("split weights must sum to 1000 permille")
    p = hash_permille(F.col(id_col), salt)
    expr = None
    acc = 0
    for name, w in splits:
        acc += w
        cond = p < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(split_col, expr)


def hash_split_sql(id_expr: str, splits: list[tuple[str, int]],
                   salt: str = "") -> str:
    """DuckDB twin of the assignment expression, generated from the
    same split list so the two engines cannot drift."""
    p = f"(('0x' || substr(md5('{salt}' || CAST({id_expr} AS VARCHAR)), 1, 12))::BIGINT % 1000)"
    acc = 0
    arms = []
    for name, w in splits:
        acc += w
        arms.append(f"WHEN {p} < {acc} THEN '{name}'")
    return "CASE " + " ".join(arms) + " END"
