"""Scalable unpartitioned rank + sliding-window aggregation (100 TB path).

Why this exists: ``Window.orderBy(...)`` with no PARTITION BY collapses to
a single partition in Spark — correct but a one-task bottleneck.  The
reference solves global windowing with 5 MR jobs: sampled range partition
(Sample+Sort), prefix-count ranking (Rank), equal-width rebalance
(Perfect), bounded replication + per-partition totals + prefix-sum window
evaluation (Aggr) — `/root/reference/src/SlidingAggregation.java:433-536`.

This module reproduces those guarantees (O(n/P) per-task memory, O(1)
extra rounds, no broadcast of data) with a Spark-native plan that stays
entirely JVM-side — no Python row serialization anywhere:

  1. deterministic range partitioning — a bounded border pass
     (the reference's Sample job re-derived as a commutative min/max/count
     histogram, see ``_deterministic_borders``) assigns each row an
     explicit partition-id column with the key property that partition
     i's keys all precede partition i+1's.  The ranged frame is cached
     for the two passes, but because the borders are a pure function of
     the data, cache loss or early release merely recomputes identical
     partitions — it can never re-border mid-query (which Spark's
     randomly-seeded RangePartitioner could, under cache eviction).
  2. pass 1: per-partition (count, total) via ``groupBy(pid)`` — a
     JVM hash aggregate replacing the reference's in-band sentinel
     counts (:159-168) and partition totals (:305-310); P tiny rows
     collected and turned into prefix offsets on the driver.
  3. pass 2: a PER-PARTITION window (PARTITION BY pid ORDER BY key) —
     parallel, spillable — assigns local row numbers and local prefix
     sums; broadcast-joining the P-row offset table turns them into the
     global rank (replaces job 3) and the global running aggregate
     S(r) (replaces job 5's prefix pass :401-417).
  4. window by prefix difference: agg over ranks [r-l+1, r] is
     S(r) - S(r-l), fetched with an equi self-join on rank-l — a plain
     shuffled 1:1 join instead of the reference's bounded replication
     (job 4, :241-313).  Data shipped twice total, independent of
     window size — strictly better than the reference's ≤3× which
     degrades as l grows.

Every stage is O(n/P) memory and fully parallel.  The prefix-difference
trick requires an invertible aggregate (sum/count/avg); non-invertible
aggregates (min/max) route to the Window path or a partition_by spec.

Integer values accumulate in int64 (the reference's int32 overflow
fixed — SURVEY.md §2.3.5); floats accumulate in double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from ..caching import persist_scoped

_INVERTIBLE = ("sum", "count", "avg")
_SCOPE = "uwms.scale"


_HIST_TYPES = (
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "date", "timestamp", "timestamp_ntz",
)


def _as_double(key, dtype: str):
    """Order-preserving double image of a key, for histogram binning only
    (borders themselves are exact values of the original type).  Temporal
    types go through microseconds-since-epoch; timestamp_ntz is read in
    the session zone, which is constant within a session so the image is
    stable for any recompute (and binning error can only cost balance,
    never correctness — routing compares exact key values)."""
    if dtype == "date":
        return F.unix_date(key).cast("double")
    if dtype == "timestamp":
        return F.unix_micros(key).cast("double")
    if dtype == "timestamp_ntz":
        return F.unix_micros(key.cast("timestamp")).cast("double")
    return key.cast("double")


def _borders_from_intervals(intervals, n: int, num_partitions: int) -> list:
    """Equi-depth walk over disjoint (count, min, max) intervals sorted
    by key: border i is the top key of the interval where cumulative
    EXACT row count crosses i·n/P — `chooseBorders`
    (`SlidingAggregation.java:75-83`) with intervals in place of sample
    elements.  Borders are actual data values (interval maxima)."""
    borders: list = []
    cum, j = 0, 1
    for cnt, mn, mx in intervals:
        cum += cnt
        while j < num_partitions and cum * num_partitions >= j * n:
            if not borders or mx > borders[-1]:
                borders.append(mx)
            j += 1
        if j >= num_partitions:
            break
    return borders


def _borders_histogram(
    keyed: DataFrame, dtype: str, num_partitions: int, buckets_per_partition: int
) -> list:
    """Equi-depth borders from a deterministic bounded histogram.

    One stats aggregate (count/min/max — one scan, P tiny partials),
    then one histogram aggregate ``groupBy(bucket)`` over
    B = buckets_per_partition·P fixed-width buckets — map-side combine
    caps each task's shuffle output at B rows, so unlike an exact
    distinct-key aggregate the shuffle is O(maps·B) REGARDLESS of key
    cardinality (the round-3 fix: a near-unique key no longer shuffles
    ~n rows before the real range exchange).  Every aggregate used
    (count/min/max) is commutative, so the result — and therefore the
    partitioning — is a pure function of the data multiset, independent
    of task order or input partitioning.

    Overweight buckets (count > n/4P, more than one distinct key) are
    refined in ≤2 further bounded passes of 64 sub-buckets each over the
    ACTUAL per-bucket [min, max] span; a bucket that narrows to
    min == max is a heavy key seen with its EXACT count, so a hot key
    pulls borders toward equal row counts and gets its range to itself
    (equal keys must share a partition — extreme skew yielding fewer
    than P ranges IS the equal-rows optimum).  At most 4P buckets can
    exceed n/4P, so each refinement collects ≤ 4P·64 rows: driver bytes
    stay O(P), n-independent.
    """
    key = F.col("_k")
    kd = _as_double(key, dtype)
    if dtype in ("float", "double"):
        # NaN sorts above every value in Spark; excluded here, NaN rows
        # fall past every border into the last range — the sort-correct
        # placement — without poisoning min/max/binning.
        keyed = keyed.where(~F.isnan(key))
    stats = keyed.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(key).alias("mn"), F.max(key).alias("mx"),
        F.min(kd).alias("mnd"), F.max(kd).alias("mxd"),
    ).collect()[0]
    n = stats["n"]
    if n == 0 or stats["mn"] == stats["mx"]:
        return []
    import math

    mnd, mxd = float(stats["mnd"]), float(stats["mxd"])
    if not (mxd > mnd) or not (math.isfinite(mnd) and math.isfinite(mxd)):
        # Double images collapse (bigints differing only below 2^-53 of
        # their magnitude) or are non-finite (±Infinity keys make every
        # bin width infinite): binning cannot discriminate — exact
        # fallback.
        return _borders_exact(keyed, n, num_partitions, buckets_per_partition)

    level0 = max(2 * num_partitions, buckets_per_partition * num_partitions)
    child_b = max(8, min(64, buckets_per_partition))
    refine_min = max(2, n // (4 * num_partitions))
    final: list = []  # (count, min, max)
    pending = [(stats["mn"], stats["mx"], stats["mnd"], stats["mxd"], level0)]
    for _depth in range(3):  # level-0 pass + ≤2 refinement passes
        if not pending:
            break
        expr, off = None, 0
        for mn, mx, mnd, mxd, nb in pending:
            w = (mxd - mnd) / nb
            local = F.least(
                F.lit(nb - 1),
                F.greatest(F.lit(0), F.floor((kd - F.lit(mnd)) / F.lit(w))),
            )
            cond = (key >= F.lit(mn)) & (key <= F.lit(mx))
            b = F.lit(off) + local
            expr = F.when(cond, b) if expr is None else expr.when(cond, b)
            off += nb
        buckets = sorted(
            (tuple(r) for r in keyed.select(expr.alias("_b"), "_k")
             .where(F.col("_b").isNotNull())
             .groupBy("_b")
             .agg(
                 F.count(F.lit(1)).alias("_c"),
                 F.min(key).alias("_mn"), F.max(key).alias("_mx"),
                 F.min(kd).alias("_mnd"), F.max(kd).alias("_mxd"),
             ).collect()),
            key=lambda t: t[0],
        )
        pending = []
        for _b, cnt, mn, mx, mnd, mxd in buckets:
            if _depth < 2 and cnt > refine_min and mn != mx and mxd > mnd:
                pending.append((mn, mx, mnd, mxd, child_b))
            else:
                final.append((cnt, mn, mx))
    assert not pending  # the last pass routes everything to `final`
    final.sort(key=lambda t: (t[1], t[2]))
    return _borders_from_intervals(final, n, num_partitions)


def _borders_exact(
    keyed: DataFrame, n: int, num_partitions: int, sample_per_partition: int
) -> list:
    """Exact-count fallback for key types the histogram cannot bin
    (strings, or numerics whose double image collapses): hash-sampled
    distinct-key aggregate — the original round-3 path.  The groupBy
    shuffles up to one row per distinct key per input partition, so this
    is reserved for the non-numeric case; HEAVY keys (count ≥ n/4P)
    enter unconditionally with exact weight, LIGHT keys enter iff
    ``xxhash64(key) % mod == 0`` with Horvitz-Thompson weight count·mod,
    and driver rows are hard-capped at 4·target in a deterministic total
    order."""
    target = sample_per_partition * num_partitions
    mod = max(1, n // target)
    heavy_min = max(2, n // (4 * num_partitions))
    counts = keyed.groupBy("_k").agg(F.count(F.lit(1)).alias("_c"))
    heavy = F.col("_c") >= heavy_min
    cand = counts.where(
        heavy | (F.pmod(F.xxhash64(F.col("_k")), F.lit(mod)) == 0)
    ).select(
        "_k",
        F.when(heavy, F.col("_c")).otherwise(F.col("_c") * mod).alias("_w"),
        heavy.alias("_h"),
    )
    pairs = sorted(
        (r[0], r[1])
        for r in cand.orderBy(
            F.col("_h").desc(), F.xxhash64(F.col("_k")), F.col("_k")
        )
        .limit(4 * target)
        .collect()
    )
    if not pairs:
        return []
    total_w = sum(w for _, w in pairs)
    return _borders_from_intervals(
        [(w, k_, k_) for k_, w in pairs], total_w, num_partitions
    )


def _deterministic_borders(
    df: DataFrame,
    order_col: str,
    num_partitions: int,
    sample_per_partition: int = 64,
) -> list:
    """Equi-depth range borders, deterministic and driver-bounded.

    This is the reference's Sample job (`SlidingAggregation.java:38-84`:
    Bernoulli-sample the keys, sort the sample, pick the P-1 equi-depth
    positions — `chooseBorders` :75-83) re-derived with three fixes:

    * its unseeded ``Random`` (:35) is replaced by commutative exact
      aggregates (count/min/max histogram for numeric keys; value-hash
      sampling for the rest), so the borders — and therefore the whole
      partitioning — are a pure function of the data.  (Spark's built-in
      RangePartitioner samples with a random seed per execution, so a
      recompute under cache loss could re-border mid-query.)
    * its single collector receiving O(n/threshold) rows is replaced by
      bounded collects: histogram buckets (O(P·buckets) rows) or the
      capped weighted sample — driver bytes n-independent either way.
    * heavy keys are seen with their exact mass (a histogram bucket that
      narrows to one key, or the unconditional heavy rule in the
      fallback), so extreme skew still yields equal-ROW-count ranges.

    Numeric/temporal keys take `_borders_histogram` (bounded shuffle:
    map-side-combined bucket counts, never a per-distinct-key exchange);
    other types take `_borders_exact`.  Returns a sorted list of border
    VALUES; partition j holds keys in (b_{j-1}, b_j].
    """
    if num_partitions <= 1:
        return []
    key = F.col(order_col)
    keyed = df.select(key.alias("_k")).where(key.isNotNull())
    dtype = dict(keyed.dtypes)["_k"]
    if dtype in _HIST_TYPES or dtype.startswith("decimal"):
        return _borders_histogram(keyed, dtype, num_partitions, sample_per_partition)
    n = keyed.count()
    if n == 0:
        return []
    return _borders_exact(keyed, n, num_partitions, sample_per_partition)


def _pid_expr(order_col: str, borders: list):
    """Partition id for a key given sorted borders: partition j holds
    keys in (b_{j-1}, b_j]; NULL keys take partition 0 (Spark ASC sorts
    NULLS FIRST).

    The reference's ``find_border`` is a linear scan
    (`SlidingAggregation.java:128-134`); a linear WHEN chain reproduces
    that at O(P) comparisons per row, which at P=1000 is a thousand
    branches in the hot per-row path.  Built instead as a BALANCED
    comparison tree over the sorted borders — O(log P) comparisons per
    row, expression size still O(P), and codegen sees short nested
    conditionals instead of one kilometer-long chain."""
    key = F.col(order_col)

    def tree(lo: int, hi: int):
        # Returns pid expr for keys known to lie in partition range [lo, hi].
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2  # compare against b_mid: <= goes [lo, mid]
        return F.when(key <= F.lit(borders[mid]), tree(lo, mid)).otherwise(
            tree(mid + 1, hi)
        )

    if not borders:
        return F.lit(0)
    return F.when(key.isNull(), F.lit(0)).otherwise(tree(0, len(borders)))


def _ranged_with_offsets(
    df: DataFrame,
    order_by: list[str],
    value_col: str | None,
    num_partitions: int,
) -> DataFrame:
    """Range-partition ``df`` and attach global rank (and, when
    ``value_col`` is given, the global inclusive prefix sum ``_prefix``).

    The returned frame is the input plus ``rank`` (dense, 0-based, in
    ``order_by`` order) [and ``_prefix``]; internal columns are dropped.

    The ranged frame keeps its partition id as an explicit COLUMN
    computed from deterministic borders (not ``spark_partition_id()``,
    which is an execution artifact), is cached for the offsets pass and
    the rank pass, and registered in a bounded session scope (older
    invocations' frames are evicted) — cache accumulation is bounded at
    ~one invocation's working set, and because the whole lineage is
    deterministic, releasing (or losing) the cache can only cost
    recompute time, never correctness.
    """
    spark = df.sparkSession
    order_cols = [F.col(c) for c in order_by]

    borders = _deterministic_borders(df, order_by[0], num_partitions)
    ranged = df.withColumn("_pid", _pid_expr(order_by[0], borders)).repartition(
        num_partitions, "_pid"
    )
    ranged = persist_scoped(ranged, _SCOPE)

    aggs = [F.count(F.lit(1)).alias("_n")]
    integral = value_col is not None and dict(df.dtypes)[value_col] in (
        "tinyint", "smallint", "int", "bigint",
    )
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col)).alias("_total"))
    stats = sorted(
        (tuple(r) for r in ranged.groupBy("_pid").agg(*aggs).collect()),
        key=lambda t: t[0],
    )

    zero = 0 if integral else 0.0
    offset_rows, r_acc, s_acc = [], 0, zero
    for row in stats:
        pid, n = row[0], row[1]
        offset_rows.append((pid, r_acc, s_acc))
        r_acc += n
        if value_col is not None and row[2] is not None:
            s_acc += row[2]
    offsets = spark.createDataFrame(
        offset_rows,
        f"_pid int, _rank_off long, _sum_off {'long' if integral else 'double'}",
    )

    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = ranged.join(F.broadcast(offsets), "_pid").withColumn(
        "rank", (F.col("_rank_off") + F.row_number().over(w) - F.lit(1)).cast("long")
    )
    if value_col is not None:
        w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        local_prefix = F.coalesce(F.sum(F.col(value_col)).over(w_run), F.lit(zero))
        out = out.withColumn("_prefix", F.col("_sum_off") + local_prefix)
    return out.drop("_pid", "_rank_off", "_sum_off")


def sliding_aggregate_scalable(
    df: DataFrame,
    order_by: list[str],
    value_col: str,
    window: int,
    agg: str = "sum",
    rank_col: str = "rank",
    agg_col: str = "agg",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed trailing-window aggregate with no single-partition stage.

    Same semantics as ``window.sliding_aggregate`` (0-based rank over
    ``order_by``; frame = rows [max(0, r-window+1), r]).  ``agg`` must be
    invertible: sum, count, or avg.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if agg not in _INVERTIBLE:
        raise ValueError(
            f"scalable path supports invertible aggregates {_INVERTIBLE}; "
            f"use sliding_aggregate (Window path) or a partition_by spec for {agg!r}"
        )
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    integral = dict(df.dtypes)[value_col] in ("tinyint", "smallint", "int", "bigint")
    zero = 0 if integral else 0.0
    prefix_df = _ranged_with_offsets(df, order_by, value_col, num_partitions)
    # Both sides of the prefix-difference self-join read this frame;
    # cache + barrier so the rank/prefix window pass runs once, not per
    # subtree (measured ~40% of query time at sf0.1).
    prefix_df = persist_scoped(prefix_df, _SCOPE)
    prefix_df.count()
    if rank_col != "rank":
        prefix_df = prefix_df.withColumnRenamed("rank", rank_col)

    # Window by prefix difference: S(r) - S(r-l).  1:1 equi-join on a
    # unique dense key; AQE picks the physical join.
    lookup = prefix_df.select(
        (F.col(rank_col) + F.lit(window)).alias(rank_col),
        F.col("_prefix").alias("_prefix_before"),
    )
    joined = prefix_df.join(lookup, on=rank_col, how="left")
    win_sum = F.col("_prefix") - F.coalesce(F.col("_prefix_before"), F.lit(zero))
    win_count = F.least(F.col(rank_col) + F.lit(1), F.lit(window)).cast("long")
    if agg == "sum":
        agg_expr = win_sum
    elif agg == "count":
        agg_expr = win_count
    else:  # avg
        agg_expr = win_sum / win_count
    return joined.withColumn(agg_col, agg_expr).drop("_prefix", "_prefix_before")


def sliding_minmax_scalable(
    df: DataFrame,
    order_by: list[str],
    value_col: str,
    window: int,
    agg: str = "min",
    rank_col: str = "rank",
    agg_col: str = "agg",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed trailing-window MIN/MAX — the non-invertible case.

    Prefix-difference does not invert min/max, so this uses the classic
    block decomposition (two-stacks / sparse-table idea, expressed in
    SQL windows): with blocks of exactly ``window`` rows
    (block = rank DIV window), the trailing window [r-l+1, r] spans at
    most two adjacent blocks, and

        win_min(r) = min( suffix_min(block of r-l+1, from r-l+1),
                          prefix_min(block of r, up to r) )

    Both pieces are RUNNING aggregates inside a block (one forward, one
    backward) — per-block windows, fully parallel, O(window) rows per
    block.  The suffix piece for rank r-l+1 is fetched with the same
    1:1 equi self-join on a shifted rank the sum path uses.  Total: one
    range exchange, two per-block windows, one shuffled join — no
    replication, no single-partition stage.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if agg not in ("min", "max"):
        raise ValueError("use sliding_aggregate_scalable for invertible aggregates")
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    agg_fn = F.min if agg == "min" else F.max

    ranked = _ranged_with_offsets(df, order_by, None, num_partitions)
    if rank_col != "rank":
        ranked = ranked.withColumnRenamed("rank", rank_col)
    ranked = ranked.withColumn("_blk", F.expr(f"{rank_col} DIV {window}"))

    # Both pieces share ONE window spec (same partitioning + ascending
    # order, different frames) so Spark evaluates them in a single
    # WindowExec pass: no second exchange, no descending re-sort.
    w_base = Window.partitionBy("_blk").orderBy(F.col(rank_col))
    w_fwd = w_base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_bwd = w_base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    pieces = ranked.withColumn("_pfx", agg_fn(F.col(value_col)).over(w_fwd)).withColumn(
        "_sfx", agg_fn(F.col(value_col)).over(w_bwd)
    )
    # Both join sides below reference `pieces`; cache it (columnar,
    # same scope as the ranged frame) so the window pass is not
    # evaluated per subtree — there is no common-subplan reuse across
    # DataFrame self-joins.  The count() is the usual eager barrier so
    # AQE's concurrent subtree stages don't race the cache population.
    pieces = persist_scoped(pieces, _SCOPE)
    pieces.count()

    # Row r looks up the suffix piece at rank r-l+1; ship it keyed by the
    # rank that will need it.  Rows in r's own block contribute via _pfx,
    # so when r-l+1 falls in the same block (only possible when
    # r-l+1 == block start) the suffix piece is redundant but harmless.
    lookup = pieces.select(
        (F.col(rank_col) + F.lit(window - 1)).alias(rank_col),
        F.col("_sfx").alias("_sfx_prev"),
    )
    joined = pieces.join(lookup, on=rank_col, how="left")
    win_val = F.when(
        F.col("_sfx_prev").isNotNull(), F.least(F.col("_pfx"), F.col("_sfx_prev"))
        if agg == "min"
        else F.greatest(F.col("_pfx"), F.col("_sfx_prev")),
    ).otherwise(F.col("_pfx"))
    return joined.withColumn(agg_col, win_val).drop("_blk", "_pfx", "_sfx", "_sfx_prev")


def prefix_max_scalable(
    df: DataFrame,
    order_by: list[str],
    value_col: str,
    out_col: str = "prefix_max",
    num_partitions: int = 32,
    inclusive: bool = True,
) -> DataFrame:
    """Global running maximum of ``value_col`` in ``order_by`` order,
    without a single-partition window — the high-watermark primitive
    (running max of event time in arrival order is exactly Structured
    Streaming's watermark bookkeeping).  ``inclusive=False`` computes
    the EXCLUSIVE prefix max (max over strictly-preceding rows, NULL
    for the global first row) — the dominance test of the skyline
    operator (`operators/skyline.pareto_frontier`): the local window
    ends at ``-1`` and the carry-in stays the same exclusive
    per-partition composition.

    Same two-pass shape as `_ranged_with_offsets` (O8/O13 in the
    reference, `SlidingAggregation.java:159-168,305-310`): range
    partition by deterministic borders, per-partition MAX (P-row
    collect), driver computes each partition's EXCLUSIVE carry-in max,
    broadcast back, per-partition running max window, combine with
    ``greatest``.  Unlike prefix sums max has no inverse, but carry-in
    composition is associative all the same — O(n/P) per machine,
    O(P) driver.
    """
    order_cols = [F.col(c) for c in order_by]
    borders = _deterministic_borders(df, order_by[0], num_partitions)
    ranged = df.withColumn("_pid", _pid_expr(order_by[0], borders)).repartition(
        num_partitions, "_pid"
    )
    ranged = persist_scoped(ranged, _SCOPE)
    stats = sorted(
        (tuple(r) for r in ranged.groupBy("_pid").agg(
            F.max(F.col(value_col)).alias("_mx")).collect()),
        key=lambda t: t[0],
    )
    carry_rows, acc = [], None
    for pid, mx in stats:
        carry_rows.append((pid, acc))
        if mx is not None and (acc is None or mx > acc):
            acc = mx
    # Carry column keeps the VALUE column's type — a hardcoded 'long'
    # would silently retype (or fail createDataFrame for) int/timestamp/
    # double inputs (ADVICE r7).
    carry_schema = StructType(
        [
            StructField("_pid", IntegerType(), False),
            StructField("_carry", df.schema[value_col].dataType, True),
        ]
    )
    carries = df.sparkSession.createDataFrame(carry_rows, carry_schema)
    w_run = Window.partitionBy("_pid").orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow if inclusive else -1
    )
    local = F.max(F.col(value_col)).over(w_run)
    if inclusive:
        out = F.greatest(local, F.coalesce(F.col("_carry"), local))
    else:
        # Either side may be NULL (first row of a partition / first
        # partition); Spark's greatest skips NULLs, so this is the
        # exclusive max of whichever exist, NULL only when neither does.
        out = F.greatest(local, F.col("_carry"))
    return (
        ranged.join(F.broadcast(carries), "_pid")
        .withColumn(out_col, out)
        .drop("_pid", "_carry")
    )
