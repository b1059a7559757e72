"""Exact distributed heavy hitters without a full-vocabulary shuffle.

The two-pass frequent-items pattern for streams whose key space grows
with the corpus (n-gram shingles, URLs, session fingerprints):

1. **Candidate pass — no shuffle.** Each partition runs a bounded
   Misra-Gries summary (capacity K) over its local stream via
   ``mapInPandas`` (Arrow-vectorized batch merges, numpy threshold
   decrements — never a per-row Python loop).  MG's guarantee: any item
   with local count > n_p/(K+1) survives the summary; by pigeonhole an
   item with GLOBAL count > n/k (k ≤ K) is locally heavy in at least
   one partition, so the union of summaries is a SUPERSET of the true
   heavy hitters.  The union is at most K rows per partition —
   collect + broadcast scale like any dimension table.
2. **Verify pass — candidate-only shuffle.** Exact counts for
   candidate keys only (a broadcast semi filter feeds the groupBy, so
   the shuffle carries candidates, not the vocabulary), plus one
   count(*) for the stream total; keep keys with ``cnt·k > n``.

The OUTPUT is therefore exact and deterministic — ``{key : count·k >
total}`` with true counts — regardless of MG's internal merge order,
which is what makes the face value-hash oracle-able (the oracle is a
plain GROUP BY … HAVING).  Contrast `operators/sketch.count_min_
estimates` (approximate, fixed-width) — this operator trades a second
pass for exactness.

Why groupBy-everything is the wrong 100 TB plan here: with vocab ≈
corpus (n-grams), even map-side partials shuffle O(distinct-per-
partition) rows — effectively the whole stream.  The MG pass bounds
per-task state at K entries and the only wide exchange is over the
(tiny) candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import persist_scoped

__all__ = ["exact_heavy_hitters"]


def exact_heavy_hitters(
    keys: DataFrame,
    key_col: str,
    k: int,
    capacity: int | None = None,
) -> DataFrame:
    """Keys with frequency > total/k, with exact counts: (key, cnt).

    ``capacity`` (default 4·k) is the per-partition MG size; it must be
    ≥ k or the superset guarantee breaks (a heavy hitter could be
    pruned), so smaller values raise.  Keys are counted as strings (the
    Arrow summary schema); cast upstream if a typed key must
    round-trip.
    """
    cap = 4 * k if capacity is None else capacity
    if cap < k:
        raise ValueError(f"capacity {cap} < k {k} voids the superset guarantee")
    src = keys.select(F.col(key_col).cast("string").alias("_k")).where(
        F.col("_k").isNotNull()
    )

    def mg_partition(batches):
        import numpy as np
        import pandas as pd

        counts: dict = {}
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            for key, c in pdf["_k"].value_counts().items():
                counts[key] = counts.get(key, 0) + int(c)
            if len(counts) > cap:
                vals = np.fromiter(counts.values(), dtype=np.int64)
                # decrement everyone by the (cap+1)-th largest value and
                # drop non-positives — the batched MG merge; total
                # decrement per surviving item ≤ n_p/(cap+1).
                d = int(np.partition(vals, len(vals) - cap - 1)[len(vals) - cap - 1])
                counts = {key: c - d for key, c in counts.items() if c - d > 0}
        # candidate rows (_n NULL) plus ONE per-partition count row
        # (_k NULL) — the stream total rides the same pass instead of
        # costing a third full scan.
        yield pd.DataFrame(
            {
                "_k": list(counts.keys()) + [None],
                "_n": [None] * len(counts) + [n_part],
            }
        )

    # tiny (≤ cap·P + P rows) but consumed twice — cache it so the MG
    # pass over the stream truly runs once.
    summary = persist_scoped(
        src.mapInPandas(mg_partition, schema="_k string, _n long"),
        "heavyhitters",
    )
    candidates = summary.where(F.col("_k").isNotNull()).select("_k").distinct()
    total = summary.where(F.col("_k").isNull()).agg(
        F.sum("_n").cast("long").alias("_n")
    )
    return (
        src.join(F.broadcast(candidates), "_k")
        .groupBy("_k")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") * F.lit(k) > F.col("_n"))
        .select(F.col("_k").alias(key_col), "cnt")
    )
