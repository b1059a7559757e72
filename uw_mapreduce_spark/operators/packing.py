"""Sequence packing and deterministic corpus shuffling — the two order-
assignment steps between a curated corpus and a training run.

Packing follows the GPT-style token-stream convention: documents are
concatenated in a deterministic global order and the stream is sliced
into fixed ``budget``-token context windows, so a document may straddle
a window boundary (its ``first_pack``/``last_pack`` then differ).  That
convention is exactly a global prefix sum, which makes it expressible as
the engine's scalable two-pass rank/prefix machinery — no
single-partition stage, no per-document Python.

The reference has no analogue (it is a generic MR pipeline); these exist
for the LLM-pipeline north star.  Both are pure functions of the data:
reruns and partial recomputes give identical assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_documents(
    docs: DataFrame,
    token_col: str,
    budget: int,
    order_by: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each document its token-stream position and pack range.

    Adds ``start_offset`` (tokens before this document in ``order_by``
    order), ``first_pack`` / ``last_pack`` (the ``budget``-token windows
    the document's tokens land in), and ``n_packs_spanned``.  Documents
    with zero tokens occupy no window; their first/last pack is the
    window their offset points at.

    Scale: one range exchange + P-row offset collect (the same
    ``_ranged_with_offsets`` plan as the scalable rank/sliding family) —
    per-task memory O(n/P), shuffle carries each row once.
    """
    from .scale import _ranged_with_offsets

    spark = docs.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    out = _ranged_with_offsets(docs, order_by, token_col, num_partitions)
    start = (F.col("_prefix") - F.col(token_col)).cast("long")
    end_incl = (F.col("_prefix") - F.lit(1)).cast("long")  # last token's offset
    budget = int(budget)
    return (
        out.withColumn("start_offset", start)
        .withColumn("_end_incl", end_incl)
        # Integer DIV, not floor(float /): offsets are non-negative longs, so
        # DIV == floor and stays exact past 2^53 total tokens.
        .withColumn("first_pack", F.expr(f"start_offset DIV {budget}"))
        .withColumn(
            "last_pack",
            F.when(F.col(token_col) > 0, F.expr(f"_end_incl DIV {budget}")).otherwise(
                F.col("first_pack")
            ),
        )
        .withColumn("n_packs_spanned", (F.col("last_pack") - F.col("first_pack") + F.lit(1)))
        .drop("_prefix", "rank", "_end_incl")
    )


def deterministic_shuffle(
    df: DataFrame,
    key_cols: list[str],
    rank_col: str = "shuffle_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic pseudo-random global permutation for training-data
    ordering: rank rows by ``md5(key)`` (any engine reproduces it — no
    seed state, no RNG), ties broken by the key itself.  The rank comes
    from the scalable two-pass path, so the plan is a range exchange on
    the hash — no single-partition stage, and a rerun or partial
    recompute yields the identical permutation.
    """
    from .rank import global_rank_scalable

    hashed = df.withColumn(
        "_h", F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols]))
    )
    out = global_rank_scalable(
        hashed, ["_h", *key_cols], rank_col=rank_col, num_partitions=num_partitions
    )
    return out.drop("_h")
