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


def click_purchase_funnel_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    delay: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER funnel: every click emits — matched clicks pair with
    each qualifying purchase exactly as the inner variant; clicks with
    NO same-user purchase in ``(ts, ts + within]`` emit once with
    sentinel ``purchase_id = -1, lag_us = -1`` (sentinels, not NULLs,
    keep the integer columns hash-stable across engines).

    Streaming semantics: Spark emits the null-matched row only once the
    watermark passes ``click.ts + within`` — i.e. once no future
    purchase can still match — so "click with no purchase" alerts fire
    exactly ``delay + within`` after the click, with state still
    bounded by the watermark.  Clicks younger than that at stream end
    are withheld, not wrong (they may yet match); the convergence test
    pins exactly this contract against the batch answer.
    """
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
    # Outer stream-stream joins REQUIRE watermarks on both sides (state
    # expiry is what triggers the null-side emit).
    if clicks.isStreaming:
        c = c.withWatermark("c_ts", delay)
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", delay)
    joined = c.join(
        p,
        F.expr(
            f"c_user = p_user AND p_ts > c_ts AND p_ts <= c_ts + INTERVAL {within}"
        ),
        "leftOuter",
    )
    return joined.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        F.coalesce(F.col("purchase_id"), F.lit(-1)).alias("purchase_id"),
        F.coalesce(
            F.unix_micros("p_ts") - F.unix_micros("c_ts"), F.lit(-1)
        ).alias("lag_us"),
    )


def view_click_purchase_funnel(
    views: DataFrame,
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    delay: str = "2 hours",
) -> DataFrame:
    """Three-step funnel as a CASCADE of watermarked stream-stream inner
    joins: (view, click, purchase) triples of the same user with
    ``view.ts < click.ts <= view.ts + within`` and
    ``click.ts < purchase.ts <= click.ts + within``.

    Two chained stateful joins (Spark supports multiple stateful
    operators in append mode); each side carries a ``delay`` watermark,
    so both joins' state stays bounded by watermark + interval exactly
    like the 2-step family.  Batch inputs run the identical plan minus
    watermarks — the convergence pytest pins a fully-drained stream to
    the batch answer, and the batch face is the oracle-checked catalog
    query (``funnel_triples_events``).

    Note the row-level contract differs from ``funnel_three_step``'s
    first-touch AGGREGATE on purpose: streaming emits every qualifying
    triple as it completes (the alerting/attribution use case); the
    batch aggregate remains the reporting face.

    Output: user_id, view_id, click_id, purchase_id, lag_vc_us,
    lag_cp_us (µs lags — integers, hash-stable)."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
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
    if views.isStreaming:
        v = v.withWatermark("v_ts", delay)
    if clicks.isStreaming:
        c = c.withWatermark("c_ts", delay)
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", delay)
    # The intermediate stream must carry exactly ONE event-time column
    # into the second stateful join (Spark rejects two watermarked
    # columns), so the view→click lag is computed eagerly and v_ts is
    # projected away; c_ts remains the single event-time column that the
    # second join's interval condition and state eviction key off.
    vc = v.join(
        c,
        F.expr(
            f"v_user = c_user AND c_ts > v_ts AND c_ts <= v_ts + INTERVAL {within}"
        ),
    ).select(
        "c_user",
        "view_id",
        "click_id",
        "c_ts",
        (F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("lag_vc_us"),
    )
    vcp = vc.join(
        p,
        F.expr(
            f"c_user = p_user AND p_ts > c_ts AND p_ts <= c_ts + INTERVAL {within}"
        ),
    )
    return vcp.select(
        F.col("c_user").alias("user_id"),
        "view_id",
        "click_id",
        "purchase_id",
        "lag_vc_us",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lag_cp_us"),
    )


def click_purchase_funnel_full(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    delay: str = "2 hours",
) -> DataFrame:
    """FULL OUTER funnel: the left-outer contract plus orphan purchases
    (a purchase with no same-user click in the preceding ``within``)
    emitting with sentinel ``click_id = -1``.  The orphan-purchase side
    is the fraud/attribution question the inner and left variants can't
    answer.  Streaming: both unmatched sides emit on watermark expiry
    of their own join horizon; state stays watermark-bounded."""
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
        "fullOuter",
    )
    return joined.select(
        F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
        F.coalesce(F.col("click_id"), F.lit(-1)).alias("click_id"),
        F.coalesce(F.col("purchase_id"), F.lit(-1)).alias("purchase_id"),
        F.coalesce(
            F.unix_micros("p_ts") - F.unix_micros("c_ts"), F.lit(-1)
        ).alias("lag_us"),
    )


def view_click_purchase_funnel_outer(
    views: DataFrame,
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    delay: str = "2 hours",
) -> DataFrame:
    """Drop-off variant of the 3-step funnel: LEFT OUTER at both
    chained joins, so every view emits with exactly how far it got —
    (view, click, purchase), (view, click, −1), or (view, −1, −1) —
    the funnel-leakage question the inner variant cannot answer.
    Sentinels (−1) rather than NULLs keep the integer columns
    hash-stable across engines, as in `click_purchase_funnel_outer`.

    Structure: a naive LEFT OUTER chain would send sentinel rows with a
    NULL c_ts into the second stateful join, where a NULL event-time
    row can never be expired by the watermark — the (view, −1, −1)
    rows would sit in state forever and never emit.  So the plan is a
    UNION of two branches whose intermediate event-time columns are
    always non-NULL:

    * matched branch: INNER view→click join (real c_ts), then LEFT
      OUTER against purchases → (v, c, p) and (v, c, −1);
    * drop-off branch: LEFT OUTER view→click filtered to the unmatched
      side → (v, −1, −1).

    On batch inputs the union is row-identical to the plain LEFT JOIN
    chain (the oracle keeps that classic form, proving equivalence);
    each branch's state stays watermark-bounded."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
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
    if views.isStreaming:
        v = v.withWatermark("v_ts", delay)
    if clicks.isStreaming:
        c = c.withWatermark("c_ts", delay)
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", delay)
    step1 = F.expr(
        f"v_user = c_user AND c_ts > v_ts AND c_ts <= v_ts + INTERVAL {within}"
    )
    step2 = F.expr(
        f"v_user = p_user AND p_ts > c_ts AND p_ts <= c_ts + INTERVAL {within}"
    )
    matched = (
        v.join(c, step1)
        .select(
            "v_user",
            "view_id",
            "click_id",
            "c_ts",
            (F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("lag_vc_us"),
        )
        .join(p, step2, "leftOuter")
        .select(
            F.col("v_user").alias("user_id"),
            "view_id",
            "click_id",
            F.coalesce(F.col("purchase_id"), F.lit(-1)).alias("purchase_id"),
            "lag_vc_us",
            F.coalesce(
                F.unix_micros("p_ts") - F.unix_micros("c_ts"), F.lit(-1)
            ).alias("lag_cp_us"),
        )
    )
    dropoff = (
        v.join(c, step1, "leftOuter")
        .where(F.col("click_id").isNull())
        .select(
            F.col("v_user").alias("user_id"),
            "view_id",
            F.lit(-1).cast("long").alias("click_id"),
            F.lit(-1).cast("long").alias("purchase_id"),
            F.lit(-1).cast("long").alias("lag_vc_us"),
            F.lit(-1).cast("long").alias("lag_cp_us"),
        )
    )
    return matched.unionByName(dropoff)
