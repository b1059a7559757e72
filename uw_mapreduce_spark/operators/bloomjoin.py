"""Bloom-filter join pruning: a map-only runtime filter for semi joins
whose build side is too large to broadcast as rows but whose KEY SET
compresses into a few-hundred-KiB bit array.

The 100 TB problem this solves: ``fact LEFT SEMI JOIN dim`` shuffles
the ENTIRE fact table on the join key even when only a few percent of
fact rows survive.  A bloom filter of the dim keys turns that into

    1. build: aggregate dim keys into an m-bit array (shuffle carries
       at most m/64 one-long rows — the BIT ARRAY, not the keys),
    2. bounded driver collect of the m/64 words (m ≤ 2^27 bits caps
       this at 16 MiB; typical 2^20 bits = 128 KiB),
    3. probe: a literal-array bit test per row — pure Catalyst
       expressions inside whole-stage codegen, NO shuffle, NO python —
       that drops every fact row whose key cannot be in dim,
    4. verify: the exact semi join runs on the survivors only, so the
       shuffle moves ~(selectivity + false-positive rate) of the fact
       table instead of all of it.

False positives only — step 4 restores exactness, so the composed
``bloom_semi_join`` is result-identical to a plain left-semi join (the
catalog query's DuckDB oracle is the plain EXISTS for that reason).

Spark's own runtime bloom filter (enabled in ``session.py``) does this
automatically for joins the optimizer can cost; this operator is the
explicit form for plans the optimizer can't see through (multi-step
pipelines, unioned probes, reuse of one filter across several probes).

Reference parity: the reference engine has no runtime filters at all —
this is part of the §2.2 "beyond the reference" join surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^20 bits = 16 Ki words = 128 KiB literal: right for build sides up to
# ~100 K keys (FPR < 1%).  Hard cap keeps the driver collect bounded.
DEFAULT_N_BITS = 1 << 20
MAX_N_BITS = 1 << 27  # 16 MiB of words — past this, use a plain semi join
DEFAULT_N_HASHES = 5


def _bit_expr(key: Column, seed: int, n_bits: int) -> Column:
    """Bit position for one hash function: xxhash64 seeded by column
    position keeps the K functions independent; pmod keeps it in
    [0, n_bits)."""
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(n_bits))


def bloom_build(build: DataFrame, key: str, *, n_bits: int = DEFAULT_N_BITS,
                n_hashes: int = DEFAULT_N_HASHES) -> list[int]:
    """Aggregate the build side's key set into an m-bit bloom filter,
    returned as a dense list of n_bits/64 longs.

    Distributed work: each key emits K bit positions; positions fold
    into (word_idx, mask) and ``bit_or`` collapses them map-side, so the
    shuffle and the driver collect are both bounded by m/64 rows no
    matter how many build rows exist."""
    if n_bits < 64 or n_bits > MAX_N_BITS or n_bits & (n_bits - 1):
        raise ValueError(
            f"n_bits must be a power of two in [64, {MAX_N_BITS}] (one word minimum)"
        )
    # NULL keys never match an equi-join, and a NULL hash would land a
    # None word index in the driver-side fill — drop them up front (the
    # probe-side bit test also nulls out on NULL keys, so both sides
    # agree with plain semi-join semantics).
    build = build.where(F.col(key).isNotNull())
    k = F.col(key)
    bits = build.select(
        F.explode(F.array(*[_bit_expr(k, i, n_bits) for i in range(n_hashes)])).alias("bit")
    )
    words = (
        bits.select(
            F.expr("cast(bit DIV 64 AS int)").alias("word_idx"),
            F.expr("shiftleft(1L, cast(bit % 64 AS int))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )
    arr = [0] * (n_bits // 64)
    # Bounded collect: at most n_bits/64 rows (<= 2 Mi longs at the cap).
    for row in words.collect():
        arr[row["word_idx"]] = row["word"]
    return arr


def bloom_prune(probe: DataFrame, key: str, words: list[int], *,
                n_hashes: int = DEFAULT_N_HASHES) -> DataFrame:
    """Drop probe rows whose key is definitely not in the filter.

    One literal array + K bit tests per row, all inside whole-stage
    codegen: no shuffle, no python, no extra pass over the data — the
    filter fuses into the probe-side scan stage.  Survivors are a
    SUPERSET of the true matches (false positives only)."""
    n_bits = len(words) * 64
    # Ship the words as a ONE-ROW broadcast frame, not a literal:
    # F.lit(list) expands to one Literal node per element, and a 16 Ki
    # element CreateArray both bloats the plan and defeats codegen
    # (measured 3x slower on the sf0.1 probe).  The single-row
    # crossJoin broadcasts ~128 KiB once; every hash's word lookup and
    # mask derive from the SAME bit expression text.
    words_df = probe.sparkSession.createDataFrame([(words,)], "__bloom_words array<long>")
    hits = []
    for i in range(n_hashes):
        bit = f"pmod(xxhash64({key}, {i}), {n_bits}L)"
        hits.append(
            f"(element_at(__bloom_words, cast({bit} DIV 64 AS int) + 1)"
            f" & shiftleft(1L, cast({bit} % 64 AS int))) != 0"
        )
    return (
        probe.crossJoin(F.broadcast(words_df))
        .where(F.expr(" AND ".join(hits)))
        .drop("__bloom_words")
    )


def bloom_semi_join(probe: DataFrame, build: DataFrame, probe_key: str,
                    build_key: str, *, n_bits: int = DEFAULT_N_BITS,
                    n_hashes: int = DEFAULT_N_HASHES) -> DataFrame:
    """Exact left-semi join with bloom pre-pruning: result-identical to
    ``probe.join(build, probe[pk] == build[bk], 'left_semi')`` — the
    verify join removes the bloom's false positives — but only the
    pruned survivors reach the shuffle."""
    # xxhash64 hashes (value, TYPE): a long probe key vs int build key
    # would hash differently and the prune would drop TRUE matches, so
    # the build key is cast to the probe key's exact type up front.
    # A NARROWING cast can wrap an out-of-range build key onto a valid
    # probe value — a match a plain semi join (which widens both sides)
    # would reject — so keep only build keys that survive a cast-back
    # round trip unchanged: lossless casts pass, wrapped/overflowed/null
    # casts are dropped (an out-of-range key can never equal any probe
    # value under widened equality, so dropping it is exact).  try_cast
    # turns ANSI overflow errors into NULLs, which the round-trip
    # comparison then filters out.
    build_type = build.schema[build_key].dataType
    probe_type = probe.schema[probe_key].dataType
    bk = F.col(build_key)
    keys = (
        build.select(bk.alias("__orig"), bk.try_cast(probe_type).alias(build_key))
        .where(F.col(build_key).try_cast(build_type).eqNullSafe(F.col("__orig")))
        .select(build_key)
        .distinct()
    )
    words = bloom_build(keys, build_key, n_bits=n_bits, n_hashes=n_hashes)
    pruned = bloom_prune(probe, probe_key, words, n_hashes=n_hashes)
    return pruned.join(
        keys.withColumnRenamed(build_key, "__bk"), pruned[probe_key] == F.col("__bk"),
        "left_semi",
    )
