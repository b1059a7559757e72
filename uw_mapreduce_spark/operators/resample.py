"""Time-series gap filling: regularize an event stream onto a fixed
step per key, carrying the last observation forward across empty steps.

The hypertable/timeseries-DB "gap fill + LOCF" operation, built from
three Catalyst stages that all scale by key:

  1. per-key bucket bounds (one map-side-combined aggregate),
  2. grid generation — ``sequence(min_bucket, max_bucket)`` exploded
     per key (rows ∝ key's span, produced where the key lives, no
     shuffle beyond the aggregate's),
  3. carry-forward — ``last(value, ignorenulls=True)`` over a per-key
     ordered window (partitioned by key: parallel, no global sort).

Buckets are integer ``floor(epoch_us / step_us)`` — engine-portable,
hash-stable, and immune to timestamp-literal/zone formatting drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_locf(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step_us: int = 3_600_000_000,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Per key: one row per ``step_us`` bucket from its first to its
    last observation, with ``n_obs`` (0 on gaps) and ``carried``
    (last-observation-carried-forward value; within a bucket the LAST
    event by (ts, tiebreak...) wins).  Output: key_cols + [bucket_col,
    n_obs, carried]."""
    keys = [F.col(c) for c in key_cols]
    # Integer DIV, not `/`: epoch-µs (~5e17) exceeds double's 2^53 exact
    # range, so float division could misbucket boundary events.
    bucket = F.expr(f"unix_micros({ts_col}) DIV {int(step_us)}")

    src = df.withColumn(bucket_col, bucket)
    # Last observation per (key, bucket): deterministic via (ts, value).
    w_in = Window.partitionBy(*keys, bucket_col).orderBy(
        F.col(ts_col).desc(), F.col(value_col).desc()
    )
    obs = (
        src.withColumn("_rn", F.row_number().over(w_in))
        .groupBy(*keys, bucket_col)
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.max(F.when(F.col("_rn") == 1, F.col(value_col))).alias("_last_v"),
        )
    )
    bounds = src.groupBy(*keys).agg(
        F.min(bucket_col).alias("_mn"), F.max(bucket_col).alias("_mx")
    )
    grid = bounds.select(
        *keys, F.explode(F.sequence(F.col("_mn"), F.col("_mx"))).alias(bucket_col)
    )
    joined = grid.join(obs, [*key_cols, bucket_col], "left").withColumn(
        "n_obs", F.coalesce(F.col("n_obs"), F.lit(0)).cast("long")
    )
    w_carry = Window.partitionBy(*keys).orderBy(bucket_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.withColumn(
        "carried", F.last(F.col("_last_v"), ignorenulls=True).over(w_carry)
    ).drop("_last_v")


def gap_fill_interpolate(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step_us: int = 3_600_000_000,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Gap filling by LINEAR INTERPOLATION — the sibling of
    `gap_fill_locf` for continuous signals (sensor readings, prices),
    where carrying the last value forward biases downstream features:

        v(b) = v_prev + (v_next − v_prev)·(b − b_prev) DIV (b_next − b_prev)

    on empty buckets (observed buckets keep their own last-observation
    value).  All integer arithmetic — both engines truncate integer
    division toward zero, so negative slopes stay bit-identical.
    Buckets interior to the series always have both anchors (the grid
    spans first..last observation); the formula's anchors come from
    two per-key ordered windows (last-non-null preceding /
    first-non-null following) — key-partitioned, parallel, no global
    sort.  Output: key_cols + [bucket_col, n_obs, filled]."""
    keys = [F.col(c) for c in key_cols]
    bucket = F.expr(f"unix_micros({ts_col}) DIV {int(step_us)}")
    src = df.withColumn(bucket_col, bucket)
    w_in = Window.partitionBy(*keys, bucket_col).orderBy(
        F.col(ts_col).desc(), F.col(value_col).desc()
    )
    obs = (
        src.withColumn("_rn", F.row_number().over(w_in))
        .groupBy(*keys, bucket_col)
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.max(F.when(F.col("_rn") == 1, F.col(value_col))).alias("_v"),
        )
    )
    bounds = src.groupBy(*keys).agg(
        F.min(bucket_col).alias("_mn"), F.max(bucket_col).alias("_mx")
    )
    grid = bounds.select(
        *keys, F.explode(F.sequence(F.col("_mn"), F.col("_mx"))).alias(bucket_col)
    )
    joined = grid.join(obs, [*key_cols, bucket_col], "left").withColumn(
        "n_obs", F.coalesce(F.col("n_obs"), F.lit(0)).cast("long")
    )
    w_prev = Window.partitionBy(*keys).orderBy(bucket_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_next = Window.partitionBy(*keys).orderBy(bucket_col).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    tagged = (
        joined
        .withColumn("_vb", F.when(F.col("n_obs") > 0, F.col(bucket_col)))
        .withColumn("_pv", F.last("_v", ignorenulls=True).over(w_prev))
        .withColumn("_pb", F.last("_vb", ignorenulls=True).over(w_prev))
        .withColumn("_nv", F.first("_v", ignorenulls=True).over(w_next))
        .withColumn("_nb", F.first("_vb", ignorenulls=True).over(w_next))
    )
    filled = F.when(F.col("n_obs") > 0, F.col("_v")).otherwise(
        F.col("_pv")
        + F.expr(f"((_nv - _pv) * ({bucket_col} - _pb)) DIV (_nb - _pb)")
    )
    return tagged.withColumn("filled", filled.cast("long")).drop(
        "_v", "_vb", "_pv", "_pb", "_nv", "_nb"
    )


def ewma_keyed(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    den: int = 8,
    tiebreak: list[str] | None = None,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key integer EWMA: s₁ = v₁; sₜ = sₜ₋₁ + trunc((vₜ−sₜ₋₁)/den)
    — exponential smoothing with α = 1/den on an exact integer grid
    (``value_col`` must already be integer units, e.g. micro-values).

    Like CUSUM (`streaming/drift.py`) and debounce, the fold is
    sequential-by-construction (sₜ depends on every prior row), but
    every step is integer arithmetic on O(1) state, so a DuckDB
    recursive CTE replays it exactly — full value-hash oracle despite
    statefulness.  Division truncates TOWARD ZERO on both engines
    (Spark DIV ≡ DuckDB ``//`` on int64); the Python kernel matches via
    sign-split floor-div.

    Scale shape (the `debounce` discipline): ONE hash repartition on
    the keys + in-partition secondary sort, then a partition-level
    Arrow ``mapInPandas`` — one Python invocation per PARTITION (not
    per key; a per-group applyInPandas pays ~1 ms/group), state carried
    across record batches.  Output = input + ``out_col``, never
    reshuffled."""
    d = int(den)
    return _keyed_integer_scan(
        df, keys, ts_col, value_col,
        lambda s, v: ewma_step(s, v, d), tiebreak, out_col,
    )


def ewma_step(s: int | None, v: int, den: int) -> int:
    """One EWMA fold step — shared by the batch scan and the streaming
    stateful processor (`streaming/smooth.py`) so both paths run the
    IDENTICAL integer kernel.  Trunc-toward-zero division (sign-split
    floor-div) matches Spark DIV and DuckDB ``//`` exactly."""
    if s is None:
        return v
    diff = v - s
    return s + (diff // den if diff >= 0 else -((-diff) // den))


def clamped_running_sum(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    delta_col: str,
    floor_at: int = 0,
    tiebreak: list[str] | None = None,
    out_col: str = "balance",
) -> DataFrame:
    """Per-key running balance clamped below at ``floor_at``:
    b₀ = floor_at; bₜ = max(floor_at, bₜ₋₁ + Δₜ) — the inventory /
    prepaid-credit / rate-limiter-token semantics where a balance can
    never go negative, which prefix sums CANNOT express (whether a
    withdrawal bites depends on every earlier clamp).  Same sequential
    -but-integer contract as `ewma_keyed`: a DuckDB recursive CTE
    replays it exactly, so the face carries a full value-hash oracle.
    Output = input + ``out_col``; one key shuffle, partition-level
    Arrow scan."""
    lo = int(floor_at)

    def step(s: int | None, v: int) -> int:
        base = lo if s is None else s
        nxt = base + v
        return nxt if nxt > lo else lo

    return _keyed_integer_scan(df, keys, ts_col, delta_col, step, tiebreak, out_col)


def _keyed_integer_scan(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    step,
    tiebreak: list[str] | None,
    out_col: str,
) -> DataFrame:
    """Shared kernel for per-key ordered integer folds (`ewma_keyed`,
    `clamped_running_sum`): hash repartition on the keys, in-partition
    secondary sort (keys, ts, tiebreak), one Arrow ``mapInPandas`` scan
    per PARTITION with the (key, state) pair carried across record
    batches.  ``step(state_or_None, v) -> new_state`` sees None at each
    key's first row; the emitted column is the state after each row."""
    from pyspark.sql.types import LongType, StructField, StructType

    order = list(keys) + [ts_col] + list(tiebreak or [])
    schema = StructType(df.schema.fields + [StructField(out_col, LongType())])
    parted = df.repartition(*[F.col(k) for k in keys]).sortWithinPartitions(
        *[F.col(c) for c in order]
    )

    def scan(batches):
        prev_key = None
        s: int | None = None
        for pdf in batches:
            vs = pdf[value_col].to_numpy()
            key_cols = [pdf[k].to_numpy() for k in keys]
            out = [0] * len(vs)
            for i in range(len(vs)):
                kt = tuple(c[i] for c in key_cols)
                if kt != prev_key:
                    prev_key = kt
                    s = None
                s = step(s, int(vs[i]))
                out[i] = s
            pdf[out_col] = out
            yield pdf

    return parted.mapInPandas(scan, schema)


def _tdiv(x: int, d: int) -> int:
    """Truncate-toward-zero division — Spark DIV ≡ DuckDB // on int64."""
    return x // d if x >= 0 else -((-x) // d)


def holt_keyed(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    alpha_den: int = 4,
    beta_den: int = 8,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Per-key integer Holt linear-trend smoothing (double exponential):

        err = v − (l + t);  a = trunc(err / alpha_den)
        l' = l + t + a;     t' = t + trunc(a / beta_den)

    with l₁ = v₁, t₁ = 0 — EWMA (`ewma_keyed`) plus a smoothed TREND
    component, so the state forecasts l+t one step ahead instead of
    lagging level shifts.  α = 1/alpha_den, β = 1/beta_den on the
    exact integer grid; both state components are integers and every
    step is trunc-div, so a DuckDB recursive CTE replays the whole
    fold — a value-hash-oracled forecaster.  Same scale shape as the
    other keyed scans: one hash repartition + in-partition sort, one
    Arrow ``mapInPandas`` per partition, state carried across
    batches.  Appends ``level`` and ``trend`` columns."""
    from pyspark.sql.types import LongType, StructField, StructType

    a_d, b_d = int(alpha_den), int(beta_den)
    order = list(keys) + [ts_col] + list(tiebreak or [])
    schema = StructType(
        df.schema.fields
        + [StructField("level", LongType()), StructField("trend", LongType())]
    )
    parted = df.repartition(*[F.col(k) for k in keys]).sortWithinPartitions(
        *[F.col(c) for c in order]
    )

    def scan(batches):
        prev_key = None
        st = None
        for pdf in batches:
            vs = pdf[value_col].to_numpy()
            key_cols = [pdf[k].to_numpy() for k in keys]
            out_l = [0] * len(vs)
            out_t = [0] * len(vs)
            for i in range(len(vs)):
                kt = tuple(c[i] for c in key_cols)
                if kt != prev_key:
                    prev_key = kt
                    st = None
                st = holt_step(st, int(vs[i]), a_d, b_d)
                out_l[i], out_t[i] = st
            pdf["level"] = out_l
            pdf["trend"] = out_t
            yield pdf

    return parted.mapInPandas(scan, schema)


def holt_step(
    state: tuple[int, int] | None, v: int, alpha_den: int, beta_den: int
) -> tuple[int, int]:
    """One Holt fold step — shared by the batch scan and the streaming
    stateful processor (`streaming/smooth.holt_stream`) so both paths
    run the IDENTICAL integer kernel, like `ewma_step`."""
    if state is None:
        return v, 0
    lv, tr = state
    astep = _tdiv(v - (lv + tr), alpha_den)
    return lv + tr + astep, tr + _tdiv(astep, beta_den)
