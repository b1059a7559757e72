"""Z-order (Morton-curve) data layout: cluster rows so that BOTH
columns of a two-dimensional predicate stay range-prunable in one
physical sort order.

The 100 TB problem: parquet scan pruning works off per-file min/max
stats, which a single sort order only makes tight for its leading
column.  Writing files ordered by the INTERLEAVED bits of two columns
(the Morton / Z curve) keeps each file's bounding box small in both
dimensions, so a predicate on either column — or both — skips most
files (the same layout trick behind Delta/Iceberg Z-ORDER clustering).

Portability: the interleave is generated as pure integer arithmetic —
``((x DIV 2^i) % 2) * 4^i`` summed over bit positions (disjoint bits,
so plain addition IS the bitwise-or) — no engine bit-op functions, so
the SAME generated expression text runs on Spark (DIV) and DuckDB (//)
and the driver's value-hash oracle covers the curve bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16  # 2^16 cells per dim → 2^32 curve positions


def quantize_sql(col: str, lo: str, hi: str, bits: int, *, div: str = "DIV") -> str:
    """Map ``col`` in [lo, hi] onto the integer grid [0, 2^bits).
    greatest() guards an all-equal column (hi == lo)."""
    scale = (1 << bits) - 1
    return (
        f"CAST((({col} - {lo}) * {scale}) {div} (CASE WHEN {hi} > {lo}"
        f" THEN {hi} - {lo} ELSE 1 END) AS BIGINT)"
    )


def z_value_sql(qx: str, qy: str, bits: int, *, div: str = "DIV") -> str:
    """Interleave two pre-quantized [0, 2^bits) integers: x takes the
    even bit positions, y the odd.  Addition of disjoint powers of two
    replaces bitwise-or, keeping the text engine-portable.  Pass plain
    COLUMN NAMES, not expression text — each operand is substituted
    2·bits times."""
    terms = []
    for i in range(bits):
        terms.append(f"(({qx} {div} {1 << i}) % 2) * {4 ** i}")
        terms.append(f"(({qy} {div} {1 << i}) % 2) * {2 * (4 ** i)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def z_value(qx: str, qy: str, bits: int = DEFAULT_BITS) -> Column:
    return F.expr(z_value_sql(qx, qy, bits))


def zorder_by(df: DataFrame, x_col: str, y_col: str, *, bits: int = DEFAULT_BITS,
              n_partitions: int | None = None) -> DataFrame:
    """Return ``df`` physically clustered along the Z curve of
    (x_col, y_col) — range-partitioned and sorted by z-value, ready for
    a partitioned write whose per-file min/max stats stay tight in both
    dimensions.

    Bounds come from one tiny min/max aggregate (a one-row broadcast,
    same idiom as the catalog's scalar subqueries); quantization and
    interleave are map-only expressions.  Both inputs must be integral
    columns (quantize floats to scaled ints first)."""
    bounds = df.agg(
        F.min(x_col).cast("long").alias("xlo"),
        F.max(x_col).cast("long").alias("xhi"),
        F.min(y_col).cast("long").alias("ylo"),
        F.max(y_col).cast("long").alias("yhi"),
    )
    with_z = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__qx", F.expr(quantize_sql(x_col, "xlo", "xhi", bits)))
        .withColumn("__qy", F.expr(quantize_sql(y_col, "ylo", "yhi", bits)))
        .withColumn("__z", z_value("__qx", "__qy", bits))
        .drop("xlo", "xhi", "ylo", "yhi", "__qx", "__qy")
    )
    if n_partitions is not None:
        with_z = with_z.repartitionByRange(n_partitions, "__z")
    return with_z.sortWithinPartitions("__z")


def z_value_sql_n(qcols: list[str], bits: int, *, div: str = "DIV") -> str:
    """N-dimensional Morton interleave: column j takes bit positions
    j, j+N, j+2N, …  Same portable addition-of-disjoint-powers
    construction as the 2-D form.  N·bits must fit a signed 64-bit
    value."""
    n = len(qcols)
    if n * bits > 62:
        raise ValueError(f"{n} dims x {bits} bits exceeds 62 usable bits")
    terms = []
    for i in range(bits):
        for j, qc in enumerate(qcols):
            terms.append(f"(({qc} {div} {1 << i}) % 2) * {1 << (i * n + j)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_by_n(df: DataFrame, cols: list[str], *, bits: int = 8,
                n_partitions: int | None = None) -> DataFrame:
    """N-column Z-order clustering (the ≥3-dimension form of
    ``zorder_by``): one bounds aggregate broadcast, per-column
    quantization, N-way interleave, range partition + sort.  Default
    bits=8 keeps 7 dimensions inside int64; raise it only for few
    columns."""
    bounds = df.agg(
        *[
            f(c).cast("long").alias(f"{tag}{j}")
            for j, c in enumerate(cols)
            for f, tag in ((F.min, "lo"), (F.max, "hi"))
        ]
    )
    with_z = df.crossJoin(F.broadcast(bounds))
    qnames = []
    for j, c in enumerate(cols):
        qn = f"__q{j}"
        with_z = with_z.withColumn(
            qn, F.expr(quantize_sql(c, f"lo{j}", f"hi{j}", bits))
        )
        qnames.append(qn)
    with_z = with_z.withColumn("__z", F.expr(z_value_sql_n(qnames, bits)))
    drop = [f"{t}{j}" for j in range(len(cols)) for t in ("lo", "hi")] + qnames
    with_z = with_z.drop(*drop)
    if n_partitions is not None:
        with_z = with_z.repartitionByRange(n_partitions, "__z")
    return with_z.sortWithinPartitions("__z")
