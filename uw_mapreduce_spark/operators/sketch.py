"""Count-min sketch: fixed-size frequency summaries with one-sided
error, plus a heavy-hitter estimate check against exact counts.

Where it fits at 100 TB: the exact token histogram shuffles the whole
VOCABULARY; a count-min sketch shuffles a CONSTANT d×w cell grid no
matter the vocabulary (the per-partition partial aggregation collapses
every occurrence into at most d·w cells before the exchange), which is
the right summary when the vocabulary itself is too large to hold —
URL frequencies, n-gram counts, feature hashing.

Hash family: the repo's portable md5-affine family
(`operators/dedup._affine_params` — one md5 per item sliced to a
48-bit base, then d affine transforms mod 2^61-1), so DuckDB rebuilds
the SAME sketch cells bit-for-bit and the driver value-hash oracle
covers the whole pipeline: build, point query (min over d rows), and
the overcount column (CMS never undercounts — est ≥ exact is a
STRUCTURAL property the oracle re-derives, not an assertion).

Reference parity: the reference engine has no sketches; this sits in
the engine's approx-aggregate family next to the HLL and quantile
accuracy gates (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _M61, _affine_params


def _portable_base(col: Column) -> Column:
    """md5 → first 12 hex chars → 48-bit integer: the family's base."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def count_min_estimates(items: DataFrame, item_col: str, *, depth: int = 4,
                        width: int = 16, check_top: int = 20) -> DataFrame:
    """Build a depth×width count-min sketch over ``items`` occurrences
    and report (item, exact count, sketch estimate, overcount) for the
    ``check_top`` most frequent items.

    The sketch build is ONE aggregation whose shuffle carries at most
    depth·width cells per map partition; the point queries join the
    top items' (row, cell) keys against the broadcast cell grid and
    take the min over rows — the textbook CMS query."""
    params = _affine_params(depth)
    occ = items.select(
        F.col(item_col).alias("item"), _portable_base(F.col(item_col)).alias("x")
    )

    def cell(i: int) -> Column:
        a, b = params[i]
        return F.struct(
            F.lit(i).alias("i"),
            ((F.lit(a) * F.col("x") + F.lit(b)) % F.lit(_M61) % F.lit(width)).alias("idx"),
        )

    sketch = (
        occ.select(F.explode(F.array(*[cell(i) for i in range(depth)])).alias("p"))
        .groupBy(F.col("p.i").alias("i"), F.col("p.idx").alias("idx"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    exact = occ.groupBy("item").agg(
        F.count(F.lit(1)).alias("n_exact"), F.min("x").alias("x")
    )
    top = exact.orderBy(F.col("n_exact").desc(), "item").limit(check_top)
    keys = top.select(
        "item", "n_exact", F.explode(F.array(*[cell(i) for i in range(depth)])).alias("p")
    ).select("item", "n_exact", "p.i", "p.idx")
    return (
        keys.join(F.broadcast(sketch), ["i", "idx"])
        .groupBy("item", "n_exact")
        .agg(F.min("n").cast("long").alias("est_n"))
        .select(
            "item",
            F.col("n_exact").cast("long").alias("n_exact"),
            "est_n",
            (F.col("est_n") - F.col("n_exact")).cast("long").alias("overcount"),
        )
    )
