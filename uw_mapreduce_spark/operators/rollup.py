"""Hypertable-style time-bucket rollups (continuous aggregates).

Not in the reference (its "window" is rank-based, not time-based —
SURVEY.md §1); this is the batch analogue of the streaming windowed
aggregation: bucket an event-time column to fixed widths and aggregate,
optionally at several resolutions in ONE pass via grouping sets (the
TimescaleDB continuous-aggregate / materialized-rollup shape).

Buckets are computed with integer epoch arithmetic
(``floor(us / width) * width``) rather than session-timezone-dependent
window functions, so results are engine- and timezone-invariant.  At
100 TB the output of ``continuous_aggregate`` is exactly what you'd
materialize (partitioned by bucket) to serve dashboard queries without
rescanning raw events; the grouping-sets form computes all resolutions
with one shuffle instead of one scan per resolution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_bucket(ts_us: Column, width_us: int) -> Column:
    """Bucket an epoch-micros column to ``width_us``-wide bins
    (bucket start, epoch micros, int64)."""
    w = F.lit(int(width_us))
    return (F.floor(ts_us / w) * w).cast("long")


def continuous_aggregate(
    df: DataFrame,
    ts_col: str,
    widths_us: dict[str, int],
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Multi-resolution rollup in one pass.

    ``widths_us`` maps an output column name to a bucket width; each
    resolution becomes one grouping set ``(bucket, *keys)``.  With a
    single width this is a plain hash aggregate; with several, one
    shuffle serves every resolution (rows carry NULL in the other
    resolutions' bucket columns, standard grouping-sets semantics).

    Accepts timestamp, timestamp_ntz (interpreted in the session
    timezone), or a raw integer epoch-microseconds column.  Rows with a
    NULL timestamp are dropped: a time bucket for them would surface as
    a NULL bucket value, indistinguishable from the NULL marker the
    other resolutions' grouping sets emit.
    """
    if not widths_us:
        raise ValueError("need at least one bucket width")
    dtype = dict(df.dtypes)[ts_col]
    ts_us = (
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        if dtype in ("timestamp", "timestamp_ntz")
        else F.col(ts_col)
    )
    df = df.where(F.col(ts_col).isNotNull())
    base = df.select(
        *[time_bucket(ts_us, w).alias(name) for name, w in widths_us.items()], "*"
    )
    sets = [[name] + keys for name in widths_us]
    group_cols = list(widths_us) + keys
    grouped = base.groupingSets(sets, *[F.col(c) for c in group_cols])
    return grouped.agg(*aggs)
