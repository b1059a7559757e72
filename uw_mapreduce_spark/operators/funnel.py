"""Generalized N-step funnel with first-touch (earliest-completion)
semantics and an optional per-step completion window.

`funnel_steps` computes, per user, the earliest timestamp of step 1,
then the earliest qualifying step-2 event strictly AFTER it (and
within ``within`` if given), and so on — the industry-standard funnel
definition (every product-analytics engine's `windowFunnel`).  The
output is one row per user who completed step 1, with one nullable
timestamp column per step and the reached ``depth``.

The greedy chain is computed as N-1 iterated prune-join-aggregate
rounds: step i's survivors (a per-user 1-row frame, shrinking every
round) join back against only the step-i+1 event slice, so each round
shuffles the SLICE pruned by the survivor set — never the whole
stream, and never a per-user array materialization.  At 100 TB the
N-1 joins all hash on user_id, which AQE coalesces into consecutive
stages over the same partitioning.

This generalizes the fixed 3-step faces (`funnel_three_step`'s
aggregate, `streaming/joins.view_click_purchase_funnel`'s row-level
stream twin) to arbitrary step lists, the way ClickHouse's
windowFunnel / Amplitude funnels are parameterized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_steps"]


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    within: int | None = None,
) -> DataFrame:
    """One row per user who completed step 1: (user, t_1..t_N, depth).

    ``t_i`` is the earliest ``steps[i]`` event strictly after ``t_{i-1}``
    (and ``<= t_{i-1} + within`` when ``within`` is given); NULL once a
    step is never completed.  ``depth`` = number of completed steps.
    ``ts_col`` must be integer event time (epoch microseconds)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("_t"),
        F.col(ts_col).alias("_ts"),
    )
    cur = (
        ev.where(F.col("_t") == steps[0])
        .groupBy("user_id")
        .agg(F.min("_ts").alias("t_1"))
    )
    for i in range(1, len(steps)):
        prev = f"t_{i}"
        nxt = f"t_{i + 1}"
        slice_i = ev.where(F.col("_t") == steps[i])
        cond = F.col("_ts") > F.col(prev)
        if within is not None:
            cond = cond & (F.col("_ts") <= F.col(prev) + F.lit(within))
        hit = (
            slice_i.join(cur.select("user_id", prev), "user_id")
            .where(cond)
            .groupBy("user_id")
            .agg(F.min("_ts").alias(nxt))
        )
        cur = cur.join(hit, "user_id", "left")
    depth = None
    for i in range(len(steps)):
        flag = F.when(F.col(f"t_{i + 1}").isNotNull(), 1).otherwise(0)
        depth = flag if depth is None else depth + flag
    return cur.withColumn("depth", depth.cast("long"))
