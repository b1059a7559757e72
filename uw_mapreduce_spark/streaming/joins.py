"""Stream-stream joins with watermark-bounded state.

The canonical funnel query — match each ``click`` to the same user's
``purchase`` within a bounded interval — as a watermarked stream-stream
inner join.  Spark keeps both sides' state only as long as the
watermark + interval require: rows older than (max event time − delay)
are evicted, so state is O(events in the join window), not O(stream).

Same code path runs on batch frames (minus the watermarks), which is
how the convergence test pins semantics: a fully-drained stream must
produce exactly the batch answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_funnel(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    delay: str = "2 hours",
) -> DataFrame:
    """Pairs (click, purchase) of the SAME user with the purchase in
    ``(click.ts, click.ts + within]``.  Streaming inputs get a
    ``delay`` watermark on both sides — required for state eviction in
    a stream-stream join; batch inputs run the identical join.

    Output: user_id, click_id, purchase_id, lag_us (purchase − click in
    µs — integer, hash-stable)."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("c_ts", delay)
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", delay)
    joined = c.join(
        p,
        F.expr(
            f"c_user = p_user AND p_ts > c_ts AND p_ts <= c_ts + INTERVAL {within}"
        ),
    )
    return joined.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lag_us"),
    )
