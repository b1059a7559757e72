"""The engine's query catalog: every operator from SURVEY.md §2 plus the
general-analytics and LLM-pipeline surface, each as a (spark, sf_dir) ->
DataFrame callable with (where SQL-expressible) a colocated DuckDB
oracle that the driver hash-compares at sf0.01.

Cross-engine hash-robustness rules used throughout (see FIXTURES.md
"Oracle notes"):
- doubles never ride through an aggregate: money/qty/values are scaled
  to integer cents/micro-units with floor(x * 10^k) BEFORE summing
  (IEEE multiplication+floor is bit-identical across engines; double
  SUM order is not),
- ratios are reported as integer per-milles (floor(1000·x)),
- raw cosine scores/timestamps are kept out of outputs (ids, ranks and
  epoch-micros instead),
- every computed column is aliased identically on both sides, and ties
  in any top-k are broken by a unique key column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.multimodal import attach_media, extract_features
from ..functions.text import doc_stats, lang_id, tokens
from ..operators.asof import asof_join
from ..operators.dedup import (
    exact_duplicates,
    fingerprint_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from ..operators.partitioning import rebalance_by_rank
from ..operators.rank import global_rank, global_rank_scalable
from ..operators.sampling import bernoulli_sample, equi_depth_borders
from ..operators.scale import sliding_aggregate_scalable
from ..operators.similarity import knn_bruteforce, knn_ivf
from ..operators.window import sliding_aggregate
from ..sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def register(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return register


# --------------------------------------------------------------------------
# shared fragments
# --------------------------------------------------------------------------

def events_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + value_u = floor(value·1e6) as int64 (hash-stable sums)."""
    return load_table(spark, sf_dir, "events").withColumn(
        "value_u", F.floor(F.col("value") * F.lit(1000000.0)).cast("long")
    )


EVENTS_U_SQL = (
    "SELECT *, CAST(floor(value * 1000000.0) AS BIGINT) AS value_u FROM events"
)

_SLIDING_SQL = """
WITH base AS (
  SELECT row_number() OVER (ORDER BY ts, event_id) - 1 AS rank, event_id,
         CAST(floor(value * 1000000.0) AS BIGINT) AS value_u
  FROM events
)
SELECT rank, event_id,
       CAST(SUM(value_u) OVER (ORDER BY rank ROWS BETWEEN {pre} PRECEDING AND CURRENT ROW) AS BIGINT) AS agg_u
FROM base
"""


def _sliding(spark, sf_dir, window, scalable=False):
    fn = sliding_aggregate_scalable if scalable else sliding_aggregate
    out = fn(
        events_u(spark, sf_dir),
        order_by=["ts", "event_id"],
        value_col="value_u",
        window=window,
        agg="sum",
        agg_col="agg_u",
    )
    return out.select("rank", "event_id", "agg_u")


# --------------------------------------------------------------------------
# reference operators (SURVEY.md §2.1) on the events table
# --------------------------------------------------------------------------

for _l in (16, 79, 91):
    query(f"sliding_sum_{_l}", _SLIDING_SQL.format(pre=_l - 1))(
        lambda spark, sf_dir, _l=_l: _sliding(spark, sf_dir, _l)
    )

query("sliding_sum_91_scalable", _SLIDING_SQL.format(pre=90))(
    lambda spark, sf_dir: _sliding(spark, sf_dir, 91, scalable=True)
)


@query(
    "sliding_count_16",
    """
WITH base AS (
  SELECT row_number() OVER (ORDER BY ts, event_id) - 1 AS rank, event_id FROM events
)
SELECT rank, event_id,
       COUNT(*) OVER (ORDER BY rank ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS cnt
FROM base
""",
)
def sliding_count_16(spark, sf_dir):
    out = sliding_aggregate(
        load_table(spark, sf_dir, "events"),
        order_by=["ts", "event_id"],
        value_col="event_id",
        window=16,
        agg="count",
        agg_col="cnt",
    )
    return out.select("rank", "event_id", "cnt")


@query(
    "sliding_avg_79_scalable",
    """
WITH base AS (
  SELECT row_number() OVER (ORDER BY ts, event_id) - 1 AS rank, event_id,
         CAST(floor(value * 1000000.0) AS BIGINT) AS value_u
  FROM events
)
SELECT rank, event_id,
       CAST(SUM(value_u) OVER w AS DOUBLE) / COUNT(value_u) OVER w AS avg_u
FROM base
WINDOW w AS (ORDER BY rank ROWS BETWEEN 78 PRECEDING AND CURRENT ROW)
""",
)
def sliding_avg_79_scalable(spark, sf_dir):
    out = sliding_aggregate_scalable(
        events_u(spark, sf_dir),
        order_by=["ts", "event_id"],
        value_col="value_u",
        window=79,
        agg="avg",
        agg_col="avg_u",
    )
    return out.select("rank", "event_id", F.col("avg_u").cast("double").alias("avg_u"))


_RANK_SQL = """
SELECT row_number() OVER (ORDER BY ts, event_id) - 1 AS rank, event_id FROM events
"""


@query("global_rank_events", _RANK_SQL)
def global_rank_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return global_rank(ev, order_by=["ts", "event_id"]).select("rank", "event_id")


@query("global_rank_scalable_events", _RANK_SQL)
def global_rank_scalable_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return global_rank_scalable(ev, order_by=["ts", "event_id"]).select("rank", "event_id")


@query(
    "total_sort_events",
    "SELECT event_id, user_id, event_type FROM events ORDER BY ts, event_id",
)
def total_sort_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.orderBy("ts", "event_id").select("event_id", "user_id", "event_type")


@query("rebalance_events", _RANK_SQL)
def rebalance_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    ranked = global_rank(ev, order_by=["ts", "event_id"]).select("rank", "event_id")
    return rebalance_by_rank(ranked, "rank", 8)


@query(
    "record_counts",
    " UNION ALL ".join(
        f"SELECT '{t}' AS tbl, count(*) AS n FROM {t}"
        for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]
    ),
)
def record_counts(spark, sf_dir):
    parts = []
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]:
        parts.append(
            load_table(spark, sf_dir, t).agg(F.count(F.lit(1)).alias("n")).select(F.lit(t).alias("tbl"), "n")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "equi_depth_borders_events",
    """
WITH v AS (SELECT CAST(floor(value * 1000000.0) AS BIGINT) AS value_u FROM events),
ranked AS (
  SELECT value_u AS border, row_number() OVER (ORDER BY value_u) AS rn,
         count(*) OVER () AS n
  FROM v
)
SELECT CAST(i AS BIGINT) AS border_idx, border
FROM ranked, generate_series(1, 7) t(i)
WHERE rn = greatest(CAST(floor(i * n / 8.0) AS BIGINT), 1)
""",
)
def equi_depth_borders_events(spark, sf_dir):
    v = events_u(spark, sf_dir).select("value_u")
    return equi_depth_borders(v, "value_u", 8)


@query("bernoulli_sample_events")  # nondeterministic across engines: rows-only check
def bernoulli_sample_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return bernoulli_sample(ev, 0.1, seed=42).select("event_id", "user_id")


# --------------------------------------------------------------------------
# general analytics surface (absent in the reference — SURVEY.md §2.2)
# --------------------------------------------------------------------------

_REV_C = "(l_extendedprice * (1.0 - l_discount)) * 100.0"


@query(
    "q1_pricing_summary",
    f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(floor(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(SUM(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_base_c,
       CAST(SUM(CAST(floor({_REV_C}) AS BIGINT)) AS BIGINT) AS sum_disc_c,
       CAST(SUM(CAST(floor(((l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)) * 100.0) AS BIGINT)) AS BIGINT) AS sum_charge_c,
       count(*) AS n_rows
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    disc = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))) * F.lit(100.0)
    charge = (
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        * (F.lit(1.0) + F.col("l_tax"))
    ) * F.lit(100.0)
    return (
        li.where(F.col("l_shipdate").cast("date") <= F.lit("1998-09-01").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.floor(F.col("l_quantity") * F.lit(100.0)).cast("long")).alias("sum_qty_c"),
            F.sum(F.floor(F.col("l_extendedprice") * F.lit(100.0)).cast("long")).alias("sum_base_c"),
            F.sum(F.floor(disc).cast("long")).alias("sum_disc_c"),
            F.sum(F.floor(charge).cast("long")).alias("sum_charge_c"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q3_shipping_priority",
    f"""
SELECT l_orderkey, CAST(SUM(CAST(floor({_REV_C}) AS BIGINT)) AS BIGINT) AS revenue_c
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
  AND CAST(l_shipdate AS DATE) > DATE '1998-03-15'
GROUP BY l_orderkey
ORDER BY revenue_c DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").cast("date") < F.lit("1998-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").cast("date") > F.lit("1998-03-15").cast("date")
    )
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))) * F.lit(100.0)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(F.sum(F.floor(rev).cast("long")).alias("revenue_c"))
        .orderBy(F.col("revenue_c").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier",
    f"""
SELECT n_name, CAST(SUM(CAST(floor({_REV_C}) AS BIGINT)) AS BIGINT) AS revenue_c
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
GROUP BY n_name
""",
)
def q5_local_supplier(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1997-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))) * F.lit(100.0)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(F.floor(rev).cast("long")).alias("revenue_c"))
    )


@query(
    "top_customers_by_revenue",
    """
SELECT c_custkey, c_name, CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_c
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY total_c DESC, c_custkey
LIMIT 10
""",
)
def top_customers_by_revenue(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(F.floor(F.col("o_totalprice") * F.lit(100.0)).cast("long")).alias("total_c"))
        .orderBy(F.col("total_c").desc(), "c_custkey")
        .limit(10)
    )


@query(
    "group_rollup_lineitem",
    """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(floor(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sum_qty_c, count(*) AS n_rows
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def group_rollup_lineitem(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.floor(F.col("l_quantity") * F.lit(100.0)).cast("long")).alias("sum_qty_c"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "group_cube_orders",
    """
SELECT o_orderstatus, o_orderpriority,
       CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_c, count(*) AS n_rows
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def group_cube_orders(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.sum(F.floor(F.col("o_totalprice") * F.lit(100.0)).cast("long")).alias("total_c"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "distinct_agg_lineitem",
    """
SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
       count(DISTINCT l_partkey) AS n_part, count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
)
def distinct_agg_lineitem(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "semi_join_parts",
    "SELECT p_partkey, p_name FROM part p WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)",
)
def semi_join_parts(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return part.join(li, part.p_partkey == li.l_partkey, "left_semi").select("p_partkey", "p_name")


@query(
    "anti_join_customers",
    "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
)
def anti_join_customers(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "set_ops_custkeys",
    """
SELECT 'both' AS tag, custkey FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
  INTERSECT
  SELECT o_custkey AS custkey FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '2000-01-01')
UNION ALL
SELECT 'only_big' AS tag, custkey FROM (
  SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
  EXCEPT
  SELECT o_custkey AS custkey FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '2000-01-01')
""",
)
def set_ops_custkeys(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    big = orders.where(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("custkey")
    )
    recent = orders.where(
        F.col("o_orderdate").cast("date") >= F.lit("2000-01-01").cast("date")
    ).select(F.col("o_custkey").alias("custkey"))
    both = big.intersect(recent).select(F.lit("both").alias("tag"), "custkey")
    only_big = big.distinct().exceptAll(recent.distinct()).select(
        F.lit("only_big").alias("tag"), "custkey"
    )
    return both.unionByName(only_big)


@query(
    "window_analytics_orders",
    """
SELECT o_custkey, o_orderkey,
       row_number() OVER w AS seq,
       date_diff('day', lag(CAST(o_orderdate AS DATE)) OVER w, CAST(o_orderdate AS DATE)) AS gap_days,
       CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_total_c
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_analytics_orders(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("seq"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).cast("long").alias("gap_days"),
        F.sum(F.floor(F.col("o_totalprice") * F.lit(100.0)).cast("long")).over(w_run).alias("run_total_c"),
    )


@query(
    "scalar_functions_part",
    """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       length(p_name) AS name_len,
       substr(p_name, 1, 5) AS name_pfx,
       concat(p_brand, ':', p_type) AS brand_type,
       replace(p_type, ' ', '_') AS type_slug,
       p_size * 2 AS size2,
       CAST(floor(abs(p_retailprice) * 100.0) AS BIGINT) AS price_c,
       p_partkey % 7 AS key_mod
FROM part
""",
)
def scalar_functions_part(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.regexp_replace("p_type", " ", "_").alias("type_slug"),
        (F.col("p_size") * 2).cast("long").alias("size2"),
        F.floor(F.abs(F.col("p_retailprice")) * F.lit(100.0)).cast("long").alias("price_c"),
        (F.col("p_partkey") % 7).cast("long").alias("key_mod"),
    )


@query(
    "date_functions_orders",
    """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(month(o_orderdate) AS BIGINT) AS o_month,
       CAST(day(o_orderdate) AS BIGINT) AS o_day,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
FROM orders
""",
)
def date_functions_orders(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
    )


@query(
    "asof_join_purchases",
    """
SELECT p.event_id, p.user_id, epoch_us(c.ts) AS last_click_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def asof_join_purchases(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, on="user_id", ts_col="ts", right_value_cols=[])
    return joined.select(
        "event_id", "user_id", F.unix_micros(F.col("ts_asof")).alias("last_click_us")
    )


# --------------------------------------------------------------------------
# subquery / outer-join family (TPC-H-shaped; adapted to the driver's
# slimmer schemas — no partsupp/commitdate/receiptdate columns exist)
# --------------------------------------------------------------------------


@query(
    "q6_forecast_revenue",
    """
SELECT CAST(SUM(CAST(floor(l_extendedprice * l_discount * 100.0) AS BIGINT)) AS BIGINT) AS revenue_c,
       count(*) AS n_rows
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * F.col("l_discount") * F.lit(100.0)).cast("long")
            ).alias("revenue_c"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q4_order_priority_exists",
    """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE)
)
GROUP BY o_orderpriority
""",
)
def q4_order_priority_exists(spark, sf_dir):
    """Correlated EXISTS with an inequality: semi-join on the key plus a
    non-equi condition — Spark plans a single shuffled semi-join, no row
    multiplication and no distinct."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate.cast("date") > orders.o_orderdate.cast("date")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q13_customer_distribution",
    """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
""",
)
def q13_customer_distribution(spark, sf_dir):
    """Left outer join + two-level aggregation (order-count histogram);
    customers with no orders survive the outer join with c_count = 0."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q14_promo_revenue",
    """
WITH j AS (
  SELECT CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT) AS rev_c, p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-09-01'
    AND CAST(l_shipdate AS DATE) < DATE '1997-10-01'
)
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END) AS BIGINT) AS promo_rev_c,
       CAST(SUM(rev_c) AS BIGINT) AS total_rev_c,
       CAST(floor(1000.0 * SUM(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END) / SUM(rev_c)) AS BIGINT) AS promo_permille
FROM j
""",
)
def q14_promo_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-09-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-10-01").cast("date"))
    )
    part = load_table(spark, sf_dir, "part")
    rev_c = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(100.0)
    ).cast("long")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        rev_c.alias("rev_c"), "p_type"
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev_c")).otherwise(F.lit(0)))
    total = F.sum("rev_c")
    return j.agg(
        promo.cast("long").alias("promo_rev_c"),
        total.cast("long").alias("total_rev_c"),
        F.floor(F.lit(1000.0) * promo / total).cast("long").alias("promo_permille"),
    )


@query(
    "q17_small_quantity_revenue",
    """
WITH pa AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(floor(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sum_qty_c,
         count(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS revenue_c,
       count(*) AS n_rows
FROM lineitem JOIN part ON p_partkey = l_partkey
              JOIN pa ON pk = l_partkey
WHERE p_brand = 'Brand#21'
  AND 5 * CAST(floor(l_quantity * 100.0) AS BIGINT) * cnt < sum_qty_c
""",
)
def q17_small_quantity_revenue(spark, sf_dir):
    """Correlated scalar subquery (per-part average quantity), decided in
    EXACT integer arithmetic: qty < 0.2·avg(qty) is evaluated as
    5·qty_c·cnt < sum_qty_c, so no engine-dependent double division can
    flip a borderline row.  The per-part aggregate is computed only for
    lineitems of the filtered brand (semi-join pruning) — result-
    identical, and at scale it shrinks the aggregate's input by the
    brand's selectivity."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#21")
    qty_c = F.floor(F.col("l_quantity") * F.lit(100.0)).cast("long")
    li_brand = li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
    pa = li_brand.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(qty_c).alias("sum_qty_c"), F.count(F.lit(1)).alias("cnt")
    )
    joined = li_brand.join(pa, li_brand.l_partkey == pa.pk).where(
        F.lit(5) * qty_c * F.col("cnt") < F.col("sum_qty_c")
    )
    return joined.agg(
        F.sum(F.floor(F.col("l_extendedprice") * F.lit(100.0)).cast("long")).alias("revenue_c"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q18_large_volume_customers",
    """
SELECT c_custkey, o_orderkey, sum_qty_c
FROM (
  SELECT l_orderkey,
         CAST(SUM(CAST(floor(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sum_qty_c
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(floor(l_quantity * 100.0) AS BIGINT)) > 30000
) big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY sum_qty_c DESC, o_orderkey
LIMIT 20
""",
)
def q18_large_volume_customers(spark, sf_dir):
    """IN-subquery-with-HAVING shape: the big-order set is an aggregate
    used as a join input; it is tiny after the HAVING, so it broadcasts
    into orders and customer."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    qty_c = F.floor(F.col("l_quantity") * F.lit(100.0)).cast("long")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty_c).alias("sum_qty_c"))
        .where(F.col("sum_qty_c") > 30000)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "o_orderkey", "sum_qty_c")
        .orderBy(F.col("sum_qty_c").desc(), "o_orderkey")
        .limit(20)
    )


@query(
    "q19_disjunctive_predicates",
    """
SELECT CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS revenue_c,
       count(*) AS n_rows
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 21)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 40)
""",
)
def q19_disjunctive_predicates(spark, sf_dir):
    """OR-of-ANDs mixing both join sides: the part-only disjunction
    (brand/size) is pushed below the broadcast join as a pre-filter;
    the cross-side residual stays as the join filter."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    arm = lambda brand, smax, qlo, qhi: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & (q >= qlo)
        & (q <= qhi)
    )
    pred = arm("Brand#12", 15, 1, 21) | arm("Brand#23", 25, 10, 30) | arm("Brand#34", 35, 20, 40)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(pred)
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(100.0)
                ).cast("long")
            ).alias("revenue_c"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q22_dormant_customers",
    """
WITH pos AS (
  SELECT CAST(SUM(CAST(floor(c_acctbal * 100.0) AS BIGINT)) AS BIGINT) AS s, count(*) AS n
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, count(*) AS n_cust,
       CAST(SUM(CAST(floor(c_acctbal * 100.0) AS BIGINT)) AS BIGINT) AS total_bal_c
FROM customer, pos
WHERE CAST(floor(c_acctbal * 100.0) AS BIGINT) * n > s
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND CAST(o_orderdate AS DATE) >= DATE '1999-01-01'
  )
GROUP BY c_nationkey
""",
)
def q22_dormant_customers(spark, sf_dir):
    """Global-average scalar subquery + anti join: above-average-balance
    customers with no recent orders.  The average compare runs in exact
    integer cross-multiplication (bal_c·n > sum_c); the one-row scalar
    broadcasts; the anti join prunes its right side to recent orders
    before shuffling."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    bal_c = F.floor(F.col("c_acctbal") * F.lit(100.0)).cast("long")
    pos = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.sum(bal_c).alias("s"), F.count(F.lit(1)).alias("n")
    )
    recent = orders.where(F.col("o_orderdate").cast("date") >= F.lit("1999-01-01").cast("date"))
    return (
        cust.crossJoin(F.broadcast(pos))
        .where(bal_c * F.col("n") > F.col("s"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"), F.sum(bal_c).alias("total_bal_c"))
    )


@query(
    "sessionize_events_batch",
    """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(floor(value * 1000000.0) AS BIGINT) AS value_u
  FROM events
),
marked AS (
  SELECT user_id, event_id, ts_us, value_u,
         CASE WHEN lag(ts_us) OVER w IS NULL
                OR ts_us - lag(ts_us) OVER w > 900000000 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT user_id, ts_us, value_u,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked
)
SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id, count(*) AS n_events,
       min(ts_us) AS sess_start_us, max(ts_us) AS sess_end_us,
       CAST(SUM(value_u) AS BIGINT) AS sum_value_u
FROM sess GROUP BY user_id, sess_id
""",
)
def sessionize_events_batch(spark, sf_dir):
    """Batch sessionization (15-min gap) as the classic two-window SQL:
    mark session starts with lag-gap, number sessions with a running
    sum, aggregate per session.  One shuffle + one sort on user_id: both
    windows order by the full tiebreak (user_id, ts_us, event_id) — rows
    tied on ts_us must take deterministic sess_ids SEMANTICALLY, not by
    luck of physical sort reuse — so the two window operators pipeline
    over a single exchange (verified in the physical plan).  (The
    streaming twin is `streaming.sliding.sessionize` via
    session_window.)"""
    ev = events_u(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("ts_us"), "value_u"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    marked = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 900_000_000), F.lit(1)).otherwise(F.lit(0))
    )
    w_run = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = marked.withColumn("sess_id", F.sum("new_sess").over(w_run).cast("long"))
    return sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("sess_start_us"),
        F.max("ts_us").alias("sess_end_us"),
        F.sum("value_u").alias("sum_value_u"),
    )


@query(
    "token_histogram_documents",
    r"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok FROM documents
)
SELECT tok, count(*) AS n FROM toks WHERE tok <> ''
GROUP BY tok ORDER BY n DESC, tok LIMIT 50
""",
)
def token_histogram_documents(spark, sf_dir):
    """Corpus vocabulary histogram: explode tokens, count, top-k.  The
    explode-then-aggregate shape partial-aggregates map-side, so the
    shuffle carries (token, partial count), not raw tokens — at 100 TB
    that is the difference between shuffling the corpus and shuffling
    the vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(50)
    )


@query(
    "top_parts_per_brand",
    """
SELECT p_brand, p_partkey, price_c, rnk FROM (
  SELECT p_brand, p_partkey,
         CAST(floor(p_retailprice * 100.0) AS BIGINT) AS price_c,
         CAST(row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rnk
  FROM part
) WHERE rnk <= 3
""",
)
def top_parts_per_brand(spark, sf_dir):
    """Per-group top-k: rank inside each brand, keep k — the windowed
    form that scales (one shuffle on the group key, no global sort);
    ties broken by the unique part key for cross-engine determinism."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), "p_partkey")
    return (
        part.select(
            "p_brand",
            "p_partkey",
            F.floor(F.col("p_retailprice") * F.lit(100.0)).cast("long").alias("price_c"),
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .where(F.col("rnk") <= 3)
    )


@query(
    "quantiles_quantity_by_flag",
    """
SELECT l_returnflag,
       CAST(floor(quantile_cont(l_quantity * 100.0, 0.25) * 10.0) AS BIGINT) AS p25_cd,
       CAST(floor(quantile_cont(l_quantity * 100.0, 0.5) * 10.0) AS BIGINT) AS p50_cd,
       CAST(floor(quantile_cont(l_quantity * 100.0, 0.9) * 10.0) AS BIGINT) AS p90_cd
FROM lineitem GROUP BY l_returnflag
""",
)
def quantiles_quantity_by_flag(spark, sf_dir):
    """Exact (interpolated) percentiles per group.  Inputs are scaled to
    integer cents first, so the only doubles are the single interpolation
    between two adjacent order statistics — identical in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_c = (F.col("l_quantity") * F.lit(100.0)).alias("qty_c")
    base = li.select("l_returnflag", qty_c)
    pct = lambda p: F.floor(F.expr(f"percentile(qty_c, {p})") * F.lit(10.0)).cast("long")
    return base.groupBy("l_returnflag").agg(
        pct(0.25).alias("p25_cd"), pct(0.5).alias("p50_cd"), pct(0.9).alias("p90_cd")
    )


@query(
    "pandas_udf_norm_embeddings",
    """
SELECT vec_id,
       CAST(list_aggregate(
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * 1000.0) AS BIGINT) * CAST(floor(x * 1000.0) AS BIGINT)),
         'sum') AS BIGINT) AS sq_norm_milli
FROM embeddings
""",
)
def pandas_udf_norm_embeddings(spark, sf_dir):
    """The engine's vectorized-UDF surface, hash-verified: an Arrow-
    batched pandas_udf computes a per-row quantity over the embedding
    array.  The math is integer-exact (scale components to int64, square,
    sum) so the Python path can be oracle-checked bit-for-bit — the
    pattern to follow for any numeric UDF that must be auditable.  One
    Arrow round-trip per batch, no per-row Python."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _sq(emb):
        return emb.map(
            lambda a: int((np.floor(np.asarray(a, dtype="float64") * 1000.0).astype("int64") ** 2).sum())
        )

    # Real type objects (this module's `from __future__ import annotations`
    # would stringify inline hints, which pandas_udf cannot resolve here).
    _sq.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    sq_norm_milli = pandas_udf(_sq, "long")

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", sq_norm_milli(F.col("embedding")).alias("sq_norm_milli"))


# --------------------------------------------------------------------------
# time-series surface: range join, continuous aggregates
# --------------------------------------------------------------------------


@query(
    "range_join_event_slices",
    """
WITH v AS (
  SELECT epoch_us(ts) AS ts_us, CAST(floor(value * 1000000.0) AS BIGINT) AS value_u FROM events
),
ranked AS (
  SELECT ts_us, row_number() OVER (ORDER BY ts_us) AS rn, count(*) OVER () AS n FROM v
),
borders AS (
  SELECT CAST(i AS BIGINT) AS border_idx, ts_us AS border
  FROM ranked, generate_series(1, 7) t(i)
  WHERE rn = greatest(CAST(floor(i * n / 8.0) AS BIGINT), 1)
),
pts AS (
  SELECT CAST(0 AS BIGINT) AS border_idx, min(ts_us) - 1 AS border FROM v
  UNION ALL SELECT border_idx, border FROM borders
  UNION ALL SELECT CAST(8 AS BIGINT), max(ts_us) FROM v
),
iv AS (
  SELECT border_idx AS slice_id, border AS lo,
         lead(border) OVER (ORDER BY border_idx) AS hi
  FROM pts QUALIFY lead(border) OVER (ORDER BY border_idx) IS NOT NULL
)
SELECT slice_id, count(*) AS n_events, CAST(SUM(value_u) AS BIGINT) AS sum_value_u
FROM v JOIN iv ON v.ts_us > iv.lo AND v.ts_us <= iv.hi
GROUP BY slice_id
""",
)
def range_join_event_slices(spark, sf_dir):
    """Point-in-interval join of events against VARIABLE-width time
    slices (the equi-depth ts octile intervals — variable width is what
    makes this a range join rather than a plain bucket groupBy).  Self-
    checking: counts per slice must come out ~n/8.  Uses the bucketized
    range_join (operators/rangejoin.py), never a cartesian plan."""
    from ..operators.rangejoin import range_join

    ev = load_table(spark, sf_dir, "events").select(
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.floor(F.col("value") * F.lit(1000000.0)).cast("long").alias("value_u"),
    )
    borders = equi_depth_borders(ev.select("ts_us"), "ts_us", 8)  # 7 rows
    caps = ev.agg(
        (F.min("ts_us") - F.lit(1)).alias("lo_cap"), F.max("ts_us").alias("hi_cap")
    )
    pts = (
        caps.select(F.lit(0).cast("long").alias("border_idx"), F.col("lo_cap").alias("border"))
        .unionByName(borders.select("border_idx", "border"))
        .unionByName(caps.select(F.lit(8).cast("long").alias("border_idx"), F.col("hi_cap").alias("border")))
    )
    w_ord = Window.orderBy("border_idx")
    iv = (
        pts.select(
            F.col("border_idx").alias("slice_id"),
            F.col("border").alias("lo"),
            F.lead("border").over(w_ord).alias("hi"),
        )
        .where(F.col("hi").isNotNull())
    )
    # ~1 week buckets over the ~2-month event span: each octile interval
    # explodes to a handful of buckets.
    joined = range_join(ev, iv, "ts_us", "lo", "hi", width=604_800_000_000, closed="right")
    return joined.groupBy("slice_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value_u").alias("sum_value_u"),
    )


@query(
    "time_bucket_rollup_events",
    """
WITH v AS (
  SELECT CAST(floor(epoch_us(ts) / 21600000000) * 21600000000 AS BIGINT) AS bucket_6h_us,
         CAST(floor(epoch_us(ts) / 86400000000) * 86400000000 AS BIGINT) AS bucket_1d_us,
         event_type,
         CAST(floor(value * 1000000.0) AS BIGINT) AS value_u
  FROM events
)
SELECT bucket_6h_us, bucket_1d_us, event_type,
       count(*) AS n_events, CAST(SUM(value_u) AS BIGINT) AS sum_value_u
FROM v
GROUP BY GROUPING SETS ((bucket_6h_us, event_type), (bucket_1d_us, event_type))
""",
)
def time_bucket_rollup_events(spark, sf_dir):
    """Hypertable-style continuous aggregate: 6-hour and 1-day rollups of
    events in ONE grouping-sets pass (one shuffle serves both
    resolutions).  Buckets use integer epoch arithmetic so they are
    timezone- and engine-invariant (TimescaleDB's time_bucket origin
    happens to align for widths dividing 86400 s)."""
    from ..operators.rollup import continuous_aggregate

    ev = events_u(spark, sf_dir)
    return continuous_aggregate(
        ev,
        "ts",
        {"bucket_6h_us": 21_600_000_000, "bucket_1d_us": 86_400_000_000},
        ["event_type"],
        [F.count(F.lit(1)).alias("n_events"), F.sum("value_u").alias("sum_value_u")],
    )


# --------------------------------------------------------------------------
# LLM-data-pipeline extensions (north star; not in reference)
# --------------------------------------------------------------------------


@query(
    "dedup_exact_documents",
    "SELECT min(doc_id) AS keep_id, count(*) AS n_dups FROM documents GROUP BY text",
)
def dedup_exact_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return exact_duplicates(docs, ["text"], "doc_id").select("keep_id", "n_dups")


@query(
    "dedup_fingerprint_documents",
    r"""
SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
       min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY 1
""",
)
def dedup_fingerprint_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return fingerprint_duplicates(docs, "text", "doc_id").select("fp", "keep_id", "n_dups")


_JACCARD_SQL = r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts FROM documents
),
flat AS (SELECT doc_id, unnest(ts) AS tk, unnest(range(len(ts))) AS i FROM tok),
sh AS (
  SELECT DISTINCT doc_id,
         tk || ' ' || lead(tk, 1) OVER w || ' ' || lead(tk, 2) OVER w || ' ' ||
         lead(tk, 3) OVER w || ' ' || lead(tk, 4) OVER w AS shingle
  FROM flat WINDOW w AS (PARTITION BY doc_id ORDER BY i)
  QUALIFY lead(tk, 4) OVER w IS NOT NULL
),
cold AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 64),
shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN cold USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(floor(1000.0 * c / (s1.n_sh + s2.n_sh - c)) AS BIGINT) AS jaccard_permille
FROM common JOIN sizes s1 ON doc_a = s1.doc_id JOIN sizes s2 ON doc_b = s2.doc_id
WHERE floor(1000.0 * c / (s1.n_sh + s2.n_sh - c)) >= 800
"""


@query("ngram_jaccard_documents", _JACCARD_SQL)
def ngram_jaccard_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # max_df=64: a shingle in >64 docs is boilerplate — it cannot push a
    # true near-dup pair below threshold but dominates the inverted
    # index's Σdf² join cost (the first thing to melt at corpus scale).
    # The oracle SQL applies the same doc-frequency cut.
    return ngram_jaccard_pairs(docs, "text", "doc_id", n=5, threshold=0.8, max_df=64)


@query(
    "dedup_clusters_documents",
    f"""
WITH RECURSIVE pairs AS ({_JACCARD_SQL}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach AS (
  SELECT DISTINCT a AS v, a AS l FROM edges
  UNION
  SELECT e.a AS v, r.l AS l FROM edges e JOIN reach r ON r.v = e.b
)
SELECT v, CAST(min(l) AS BIGINT) AS label FROM reach GROUP BY v
""",
)
def dedup_clusters_documents(spark, sf_dir):
    """Near-dup pairs collapsed to duplicate CLUSTERS (connected
    components by iterative min-label propagation) — the step between
    pair scoring and keep-one-per-group curation.  Oracle: DuckDB
    recursive CTE computing min reachable id per vertex."""
    from ..operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=5, threshold=0.8, max_df=64)
    return connected_components(pairs, "doc_a", "doc_b").select("v", "label")


@query("minhash_lsh_documents")  # xxhash64 has no DuckDB twin: rows-only
def minhash_lsh_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "text", "doc_id", n=5, threshold=0.5)


@query("simhash_documents")  # rows-only
def simhash_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return simhash(docs, "text", "doc_id")


@query(
    "knn_cosine_top5",
    """
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cos
  FROM q JOIN embeddings e ON e.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, rnk FROM (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
  FROM scored
) WHERE rnk <= 5
""",
)
def knn_cosine_top5(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return knn_bruteforce(emb, queries, k=5)


@query("knn_ivf_top5")  # probabilistic recall: rows-only
def knn_ivf_top5(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return knn_ivf(emb, queries, k=5, num_centroids=16, n_probes=4)


@query(
    "embedding_stats_by_label",
    """
SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
       CAST(SUM(CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_e0_u
FROM embeddings GROUP BY label
""",
)
def embedding_stats_by_label(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy(F.col("label").cast("long").alias("label")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.floor(F.element_at("embedding", 1).cast("double") * F.lit(1000000.0)).cast("long")
        ).alias("sum_e0_u"),
    )


@query(
    "doc_stats_documents",
    r"""
WITH t AS (
  SELECT doc_id, text, string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents
)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq_tokens,
       CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
       CAST(len(list_filter(toks, tk -> list_contains(['the','a','of','and','to','in','is','it','that','for'], tk))) AS BIGINT) AS n_stopwords,
       CAST(floor(1000.0 * len(list_filter(toks, tk -> list_contains(['the','a','of','and','to','in','is','it','that','for'], tk))) / len(toks)) AS BIGINT) AS stopword_permille,
       CAST(floor(1000.0 * len(list_distinct(toks)) / len(toks)) AS BIGINT) AS uniq_permille
FROM t
""",
)
def doc_stats_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return doc_stats(docs, "text", "doc_id")


@query(
    "token_count_by_lang",
    r"""
SELECT lang, count(*) AS n_docs,
       CAST(SUM(CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)) AS BIGINT) AS total_tokens,
       CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
""",
)
def token_count_by_lang(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(F.col("text"))).cast("long")).alias("total_tokens"),
        F.sum(F.length("text").cast("long")).alias("total_chars"),
    )


@query("lang_id_documents")  # heuristic classifier: rows-only
def lang_id_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id(F.col("text")).alias("lang_pred"))


@query("multimodal_features")  # mapInPandas plumbing: rows-only
def multimodal_features(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media(
        docs.withColumn("payload", F.encode(F.col("text"), "utf-8")), "doc_id", "payload"
    )
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.floor(F.col("byte_mean") * F.lit(1000.0)).cast("long").alias("byte_mean_milli"),
    )


@query("multimodal_decode_real")  # real decode via mapInPandas: rows-only
def multimodal_decode_real(spark, sf_dir):
    """REAL image decode end-to-end: synthesize a deterministic 8×8 P6
    PPM per document JVM-side (ASCII header + 12 chained md5 digests as
    the 192 raw RGB bytes — pure Catalyst expressions, no Python until
    the decode), then run the dependency-free PPM decoder through the
    Arrow ``mapInPandas`` stage and return integer-stable dimensions and
    per-channel means.  Exercises the same schema/batch plumbing a
    JPEG+PIL deployment would use, with the codec this container can
    actually run."""
    from ..functions.multimodal import extract_decoded_features

    docs = load_table(spark, sf_dir, "documents")
    digests = F.concat(
        *[F.md5(F.concat(F.col("text"), F.lit(str(i)))) for i in range(12)]
    )
    payload = F.concat(F.encode(F.lit("P6\n8 8\n255\n"), "utf-8"), F.unhex(digests))
    media = attach_media(docs.withColumn("payload", payload), "doc_id", "payload")
    return extract_decoded_features(media).select(
        "media_id",
        "width",
        "height",
        F.transform(
            "channel_means", lambda m: F.floor(m * F.lit(1000.0)).cast("long")
        ).alias("channel_means_milli"),
        "decode_error",
    )


@query(
    "grouping_sets_lineitem",
    """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(floor(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sum_qty_c, count(*) AS n_rows
FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
""",
)
def grouping_sets_lineitem(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
    ).agg(
        F.sum(F.floor(F.col("l_quantity") * F.lit(100.0)).cast("long")).alias("sum_qty_c"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "pivot_priority_by_status",
    """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(floor(o_totalprice * 100.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS total_f_c,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(floor(o_totalprice * 100.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS total_o_c,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(floor(o_totalprice * 100.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS total_p_c
FROM orders GROUP BY o_orderpriority
""",
)
def pivot_priority_by_status(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0)).cast("long")
    def bucket(status):
        return F.sum(F.when(F.col("o_orderstatus") == status, cents).otherwise(F.lit(0)))
    return orders.groupBy("o_orderpriority").agg(
        bucket("F").alias("total_f_c"),
        bucket("O").alias("total_o_c"),
        bucket("P").alias("total_p_c"),
    )


@query("approx_distinct_parts")  # HLL sketches differ per engine: rows-only
def approx_distinct_parts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts")
    )


_SLIDING_MINMAX_SQL = """
WITH base AS (
  SELECT row_number() OVER (ORDER BY ts, event_id) - 1 AS rank, event_id,
         CAST(floor(value * 1000000.0) AS BIGINT) AS value_u
  FROM events
)
SELECT rank, event_id,
       {fn}(value_u) OVER (ORDER BY rank ROWS BETWEEN {pre} PRECEDING AND CURRENT ROW) AS agg_u
FROM base
"""


def _sliding_minmax(spark, sf_dir, window, agg):
    from ..operators.scale import sliding_minmax_scalable

    out = sliding_minmax_scalable(
        events_u(spark, sf_dir),
        order_by=["ts", "event_id"],
        value_col="value_u",
        window=window,
        agg=agg,
        agg_col="agg_u",
    )
    return out.select("rank", "event_id", "agg_u")


query("sliding_min_79_scalable", _SLIDING_MINMAX_SQL.format(fn="MIN", pre=78))(
    lambda spark, sf_dir: _sliding_minmax(spark, sf_dir, 79, "min")
)
query("sliding_max_91_scalable", _SLIDING_MINMAX_SQL.format(fn="MAX", pre=90))(
    lambda spark, sf_dir: _sliding_minmax(spark, sf_dir, 91, "max")
)


# --------------------------------------------------------------------------
# SQL front-end: the oracle strings are ANSI enough to run verbatim on
# Spark SQL itself — same text, two engines, hash-identical results.
# --------------------------------------------------------------------------

def _sql_passthrough(sql: str, tables: list[str]):
    def run(spark, sf_dir):
        for t in tables:
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        return spark.sql(sql)

    return run


query("sql_api_q1", ORACLE["q1_pricing_summary"])(
    _sql_passthrough(ORACLE["q1_pricing_summary"], ["lineitem"])
)
query("sql_api_sliding_16", ORACLE["sliding_sum_16"])(
    _sql_passthrough(ORACLE["sliding_sum_16"], ["events"])
)
query("sql_api_top_customers", ORACLE["top_customers_by_revenue"])(
    _sql_passthrough(ORACLE["top_customers_by_revenue"], ["customer", "orders"])
)


@query(
    "cosine_near_dup_pairs",
    """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45
""",
)
def cosine_near_dup_pairs_q(spark, sf_dir):
    from ..operators.similarity import cosine_near_dup_pairs_numpy

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_near_dup_pairs_numpy(emb, threshold=0.45)


@query("cosine_near_dup_lsh")  # probabilistic recall: rows-only
def cosine_near_dup_lsh_q(spark, sf_dir):
    from ..operators.similarity import cosine_near_dup_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_near_dup_lsh(emb, threshold=0.45)


@query(
    "array_functions_embeddings",
    """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000.0) AS BIGINT) AS e0_u,
       CAST(floor(CAST(embedding[64] AS DOUBLE) * 1000000.0) AS BIGINT) AS e63_u,
       CAST(floor(CAST(list_aggregate(embedding::DOUBLE[], 'sum') AS DOUBLE) * 1000.0) AS BIGINT) AS sum_milli
FROM embeddings
""",
)
def array_functions_embeddings(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    arr_sum = F.aggregate(
        F.col("embedding"), F.lit(0.0), lambda acc, v: acc + v.cast("double")
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.floor(F.element_at("embedding", 1).cast("double") * F.lit(1000000.0)).cast("long").alias("e0_u"),
        F.floor(F.element_at("embedding", 64).cast("double") * F.lit(1000000.0)).cast("long").alias("e63_u"),
        F.floor(arr_sum * F.lit(1000.0)).cast("long").alias("sum_milli"),
    )


@query("winnow_fingerprint_documents")  # xxhash64: no DuckDB twin, rows-only
def winnow_fingerprint_documents(spark, sf_dir):
    from ..operators.dedup import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    return winnow_fingerprints(docs)


@query(
    "curation_pipeline",
    r"""
WITH stats AS (
  SELECT doc_id, lang,
         md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
         CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT) AS n_uniq
  FROM documents
),
deduped AS (
  SELECT * FROM stats
  QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
),
kept AS (
  SELECT * FROM deduped
  WHERE n_tokens >= 20 AND floor(1000.0 * n_uniq / n_tokens) >= 300
)
SELECT lang, count(*) AS n_docs_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens_kept
FROM kept GROUP BY lang
""",
)
def curation_pipeline(spark, sf_dir):
    """End-to-end corpus curation as ONE lazy DataFrame: fingerprint
    dedup (keep lowest doc_id per normalized-content hash) -> quality
    gate (length + lexical diversity) -> per-language token budget.
    Composes fingerprint(), tokens() and a window dedup; Catalyst fuses
    the whole thing into scan -> project -> window -> filter -> agg."""
    from ..functions.text import fingerprint, tokens as tok_fn

    docs = load_table(spark, sf_dir, "documents")
    toks = tok_fn(F.col("text"))
    stats = docs.select(
        "doc_id",
        "lang",
        fingerprint(F.col("text")).alias("fp"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    deduped = stats.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    kept = deduped.where(
        (F.col("n_tokens") >= 20)
        & (F.floor(F.lit(1000.0) * F.col("n_uniq") / F.col("n_tokens")) >= 300)
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").alias("total_tokens_kept"),
    )


_SHINGLE_CTE = r"""
tok AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts FROM documents
),
flat AS (SELECT doc_id, unnest(ts) AS tk, unnest(range(len(ts))) AS i FROM tok),
sh AS (
  SELECT DISTINCT doc_id,
         tk || ' ' || lead(tk, 1) OVER w || ' ' || lead(tk, 2) OVER w || ' ' ||
         lead(tk, 3) OVER w || ' ' || lead(tk, 4) OVER w AS shingle
  FROM flat WINDOW w AS (PARTITION BY doc_id ORDER BY i)
  QUALIFY lead(tk, 4) OVER w IS NOT NULL
)
"""


@query(
    "decontaminate_documents",
    f"""
WITH {_SHINGLE_CTE},
t0 AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
cold AS (SELECT shingle FROM t0 GROUP BY shingle HAVING count(*) <= 64),
t AS (SELECT t0.doc_id, t0.shingle FROM t0 JOIN cold USING (shingle)),
e AS (SELECT * FROM sh WHERE doc_id % 50 = 0)
SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc, count(*) AS n_common
FROM t JOIN e ON t.shingle = e.shingle
GROUP BY 1, 2 HAVING count(*) >= 5
""",
)
def decontaminate_documents(spark, sf_dir):
    """Benchmark decontamination: which training documents leak n-gram
    content from the holdout set (doc_id % 50 == 0 stands in for the
    eval benchmark)?  Inverted-index join across the two corpora — the
    audit every serious pretraining pipeline runs before training.
    ``max_df=64`` prunes boilerplate shingles by train-side document
    frequency (mirrored in the oracle), keeping the join bounded at
    corpus scale."""
    from ..operators.dedup import cross_corpus_overlap

    docs = load_table(spark, sf_dir, "documents")
    holdout = docs.where(F.col("doc_id") % 50 == 0)
    train = docs.where(F.col("doc_id") % 50 != 0)
    return cross_corpus_overlap(
        train, holdout, "text", "doc_id", n=5, min_common=5, max_df=64
    )


@query(
    "redact_pii_documents",
    r"""
WITH salted AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         '@example.com or 555-01' || lpad(CAST(doc_id AS VARCHAR), 2, '0') || '.' AS t
  FROM documents
),
counted AS (
  SELECT doc_id, t,
         len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM salted
)
SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t1, '[0-9]{3}[-.][0-9]{3,4}[-.]?[0-9]{0,4}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(t1, '[0-9]{3}[-.][0-9]{3,4}[-.]?[0-9]{0,4}', '<PHONE>', 'g')) AS redacted_md5
FROM counted
""",
)
def redact_pii_documents(spark, sf_dir):
    """PII scrubbing over the corpus: redact emails then phone-like
    digit runs, reporting per-doc counts and an md5 of the scrubbed
    text (raw scrubbed text stays out of the result; the hash proves
    byte-exact redaction against the oracle).  The corpus has no real
    PII, so each row is salted with a synthetic contact line derived
    from doc_id — both engines construct and scrub the same string.
    Pure regexp expressions: whole-stage codegen, no UDF."""
    from ..functions.text import pii_counts, redact_pii

    docs = load_table(spark, sf_dir, "documents")
    salted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-01"),
            F.lpad(F.col("doc_id").cast("string"), 2, "0"), F.lit("."),
        ).alias("t"),
    )
    n_emails, n_phones = pii_counts(F.col("t"))
    return salted.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        F.md5(redact_pii(F.col("t")).cast("binary")).alias("redacted_md5"),
    )


@query(
    "repetition_stats_documents",
    r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts FROM documents
),
flat AS (SELECT doc_id, unnest(ts) AS tk, unnest(range(len(ts))) AS i FROM tok),
uni AS (SELECT doc_id, tk AS g, count(*) AS c FROM flat WHERE tk <> '' GROUP BY 1, 2),
u AS (
  SELECT doc_id, CAST(floor(1000.0 * max(c) / sum(c)) AS BIGINT) AS top_token_permille
  FROM uni GROUP BY doc_id
),
bflat AS (
  SELECT doc_id, tk || ' ' || lead(tk, 1) OVER (PARTITION BY doc_id ORDER BY i) AS g
  FROM flat QUALIFY lead(tk, 1) OVER (PARTITION BY doc_id ORDER BY i) IS NOT NULL
),
bic AS (SELECT doc_id, g, count(*) AS c FROM bflat GROUP BY 1, 2),
b AS (
  SELECT doc_id, CAST(floor(1000.0 * max(c) / sum(c)) AS BIGINT) AS top_bigram_permille
  FROM bic GROUP BY doc_id
)
SELECT u.doc_id, u.top_token_permille,
       COALESCE(b.top_bigram_permille, 0) AS top_bigram_permille
FROM u LEFT JOIN b ON u.doc_id = b.doc_id
""",
)
def repetition_stats_documents(spark, sf_dir):
    """Within-document repetition (Gopher-style quality gates): per-mille
    share of the most frequent token and token bigram.  Degenerate or
    template text scores high and gets dropped by curation."""
    from ..functions.text import repetition_stats

    docs = load_table(spark, sf_dir, "documents")
    return repetition_stats(docs, "text", "doc_id")


@query(
    "tf_df_top_terms_documents",
    r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts FROM documents
),
flat AS (SELECT doc_id AS doc, unnest(ts) AS term FROM tok),
tf AS (SELECT doc, term, count(*) AS tf FROM flat WHERE term <> '' GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT doc, tf.term, CAST(floor(1000000.0 * tf / df) AS BIGINT) AS score
  FROM tf JOIN dfreq ON tf.term = dfreq.term
)
SELECT doc AS doc_id, term, score,
       CAST(row_number() OVER (PARTITION BY doc ORDER BY score DESC, term) AS BIGINT) AS rnk
FROM scored
QUALIFY rnk <= 3
""",
)
def tf_df_top_terms_documents(spark, sf_dir):
    """Most distinctive terms per document (tf/df ranking — tf-idf
    without the corpus-constant log factor, exact across engines)."""
    from ..functions.text import tf_df_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tf_df_top_terms(docs, "text", "doc_id", k=3)


@query(
    "unpivot_priority_metrics",
    """
WITH wide AS (
  SELECT o_orderpriority,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(floor(o_totalprice * 100.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS total_f_c,
         CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(floor(o_totalprice * 100.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS total_o_c,
         CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(floor(o_totalprice * 100.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS total_p_c
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, status, total_c
FROM wide
UNPIVOT (total_c FOR status IN (total_f_c, total_o_c, total_p_c))
""",
)
def unpivot_priority_metrics(spark, sf_dir):
    """Wide-to-long reshaping (the inverse of the pivot query): melt the
    per-status pivot columns back to (priority, status, value) rows via
    `DataFrame.unpivot`.  Round-trips the pivot family; reshape happens
    post-aggregation on the tiny wide frame, so the plan is the pivot
    plan plus one local expand."""
    wide = pivot_priority_by_status(spark, sf_dir)
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["total_f_c", "total_o_c", "total_p_c"],
        variableColumnName="status",
        valueColumnName="total_c",
    )


@query("stratified_sample_documents")  # sampler RNG is engine-specific: rows-only
def stratified_sample_documents(spark, sf_dir):
    """Per-language sampling budget (downsample the dominant language,
    keep the tail): seeded `sampleBy` — the curation move that
    rebalances a corpus before training.  Deterministic for a given
    seed within Spark (pytest), but no DuckDB twin samples identically,
    so the driver check is rows-only like `bernoulli_sample_events`."""
    docs = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.25, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 1.0}
    return docs.sampleBy("lang", fractions, seed=42).select("doc_id", "lang")
