"""TPC-H-shaped query family, round 2: the remaining classic join/
subquery shapes (q2, q7, q8, q9, q10, q11, q12, q15, q16, q20, q21),
adapted to the driver's slimmer schemas (no partsupp / shipmode /
commitdate / receiptdate — proxies documented per query).

Every query follows the catalog's hash-robustness rules (money in
integer cents via floor(x*100.0), ratios as integer per-milles via
integer DIV, ties broken on unique keys) and the catalog's scale
discipline: dimension tables broadcast, selective filters pushed below
joins, no self-join where an aggregation can carry the same semantics
(see q21's rewrite).  Registered into ``plans/_registry`` like the
sibling catalog modules.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.bloomjoin import bloom_semi_join
from ..sources.tables import load_table
from ._registry import query

# Same association order as catalog._REV_C so Spark and DuckDB run the
# bit-identical IEEE expression before floor().
_REV_C_SQL = "CAST(floor((l_extendedprice * (1.0 - l_discount)) * 100.0) AS BIGINT)"


def _rev_c():
    return F.floor(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))) * F.lit(100.0)
    ).cast("long")


def _nations_of_region(spark, sf_dir, r_name):
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == r_name)
    return nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey).select(
        "n_nationkey", "n_name"
    )


@query(
    "q7_volume_shipping",
    f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS l_year,
       CAST(SUM({_REV_C_SQL}) AS BIGINT) AS revenue_c
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_2'))
  AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 (volume shipping between two nations, by ship year).

    Scale plan: the nation-pair predicate needs BOTH sides, but each
    side's membership (`nation IN (A, B)`) pushes below the join —
    supplier and customer are pre-filtered to the two nations before
    any fact-table join, so the big lineitem⋈orders join only carries
    rows that can possibly qualify; the cross-side exclusion (A-A /
    B-B) is the only residual."""
    pair = ("NATION_2", "NATION_7")
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name").isin(*pair))
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date"))
    )
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("date")).cast("long").alias("l_year"),
        )
        .agg(F.sum(_rev_c()).alias("revenue_c"))
    )


@query(
    "q8_market_share",
    f"""
WITH all_rev AS (
  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
         {_REV_C_SQL} AS rev_c,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey  = c_custkey
  JOIN part     ON l_partkey  = p_partkey
  JOIN supplier ON l_suppkey  = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region    ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN rev_c ELSE 0 END) AS BIGINT) AS nation_rev_c,
       CAST(SUM(rev_c) AS BIGINT) AS total_rev_c,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN rev_c ELSE 0 END) * 1000
            // SUM(rev_c) AS BIGINT) AS share_permille
FROM all_rev
GROUP BY o_year
""",
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 (national market share): NATION_2's share of PROMO-part
    revenue sold to ASIA customers, by order year.  The share is exact
    integer DIV per-mille — no double division to disagree on.  part
    (pre-filtered), supplier+nation, and the ASIA customer set's nation
    map all broadcast; only lineitem⋈orders shuffles."""
    asia = _nations_of_region(spark, sf_dir, "ASIA")
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(asia), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    nat = F.sum(
        F.when(F.col("supp_nation") == "NATION_2", F.col("rev_c")).otherwise(F.lit(0))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey, "left_semi")
        .select(
            F.year(F.col("o_orderdate").cast("date")).cast("long").alias("o_year"),
            _rev_c().alias("rev_c"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            nat.cast("long").alias("nation_rev_c"),
            F.sum("rev_c").cast("long").alias("total_rev_c"),
            F.expr(
                "CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN rev_c ELSE 0 END) * 1000"
                " DIV SUM(rev_c) AS BIGINT)"
            ).alias("share_permille"),
        )
    )


@query(
    "q9_product_type_profit",
    f"""
SELECT n_name AS nation,
       CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
       CAST(SUM({_REV_C_SQL}
                - CAST(floor((l_quantity * p_retailprice) * 100.0) AS BIGINT)) AS BIGINT) AS profit_c
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey  = p_partkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
""",
)
def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 (product-type profit by supplier nation and year).  No
    partsupp table exists, so cost is proxied by l_quantity ×
    p_retailprice (reference shape: revenue − supplycost×qty).  part is
    filtered by the name LIKE before broadcasting — the fact join only
    sees widget lineitems; supplier⋈nation broadcasts."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cost_c = F.floor((F.col("l_quantity") * F.col("p_retailprice")) * F.lit(100.0)).cast(
        "long"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .groupBy(
            "nation", F.year(F.col("o_orderdate").cast("date")).cast("long").alias("o_year")
        )
        .agg(F.sum(_rev_c() - cost_c).cast("long").alias("profit_c"))
    )


@query(
    "q10_returned_items",
    f"""
SELECT c_custkey, c_name, n_name,
       CAST(floor(c_acctbal * 100.0) AS BIGINT) AS acctbal_c,
       CAST(SUM({_REV_C_SQL}) AS BIGINT) AS revenue_c
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND CAST(o_orderdate AS DATE) >= DATE '1997-07-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1997-10-01'
GROUP BY c_custkey, c_name, n_name, acctbal_c
ORDER BY revenue_c DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting): top 20 customers by revenue
    lost to returns in one quarter.  Both selective predicates
    (returnflag, order quarter) push to the scans; nation broadcasts;
    the top-k is a TakeOrderedAndProject (per-partition heap + driver
    merge of 20 rows), never a global sort."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate").cast("date") >= F.lit("1997-07-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1997-10-01").cast("date"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "n_name",
            F.floor(F.col("c_acctbal") * F.lit(100.0)).cast("long").alias("acctbal_c"),
        )
        .agg(F.sum(_rev_c()).alias("revenue_c"))
        .orderBy(F.col("revenue_c").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q11_value_concentration",
    r"""
WITH pv AS (
  SELECT l_partkey, CAST(SUM(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS value_c
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, value_c
FROM pv, (SELECT SUM(value_c) AS total_c FROM pv)
WHERE value_c * 2000 > total_c
""",
)
def q11_value_concentration(spark, sf_dir):
    """TPC-H Q11 (important stock): parts whose traded value exceeds an
    above-average share of the global total (no partsupp, so lineitem
    extendedprice is the value proxy).  The global total is a one-row
    scalar broadcast; the threshold compare is integer
    cross-multiplication (value·2000 > total), never a double
    fraction."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * F.lit(100.0)).cast("long")).alias("value_c")
    )
    total = pv.agg(F.sum("value_c").alias("total_c"))
    return (
        pv.crossJoin(F.broadcast(total))
        .where(F.col("value_c") * F.lit(2000) > F.col("total_c"))
        .select("l_partkey", "value_c")
    )


@query(
    "q12_shipping_delay_class",
    r"""
SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) < 30 THEN 'fast'
            WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) < 90 THEN 'normal'
            ELSE 'late' END AS delay_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1998-01-01'
GROUP BY delay_class
""",
)
def q12_shipping_delay_class(spark, sf_dir):
    """TPC-H Q12 (shipping-mode priority counts).  No l_shipmode /
    commitdate / receiptdate exist, so the category is the order→ship
    delay bucket (fast <30d, normal <90d, late ≥90d) — same shape:
    join, derived category, conditional counts per category.  Day
    arithmetic is integer datediff on DATEs, exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date"))
    )
    orders = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    cls = (
        F.when(delay < 30, F.lit("fast")).when(delay < 90, F.lit("normal")).otherwise(F.lit("late"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(cls.alias("delay_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "q15_top_supplier",
    f"""
WITH rev AS (
  SELECT l_suppkey, CAST(SUM({_REV_C_SQL}) AS BIGINT) AS total_rev_c
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
    AND CAST(l_shipdate AS DATE) <  DATE '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev_c
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev_c = (SELECT MAX(total_rev_c) FROM rev)
""",
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 (top supplier): per-supplier quarterly revenue, keep
    the supplier(s) equal to the max (scalar subquery over the same
    aggregate — computed once and reused, the max is a one-row
    broadcast).  Integer cents make the equality exact."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-04-01").cast("date"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev_c()).alias("total_rev_c"))
    mx = rev.agg(F.max("total_rev_c").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev_c") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev_c")
    )


@query(
    "q16_supplier_variety",
    r"""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#21' AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q16_supplier_variety(spark, sf_dir):
    """TPC-H Q16 (parts/supplier relationship): how many distinct
    suppliers ship each surviving (brand, type, size) bucket.  The
    partsupp relation is proxied by lineitem's (partkey, suppkey)
    pairs; "customer complaints" suppliers are proxied by negative
    account balance and removed with a broadcast anti join (the NOT IN
    set is tiny).  countDistinct partial-aggregates map-side."""
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#21")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@query(
    "q20_dominant_suppliers",
    r"""
WITH sq AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(floor(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS supp_qty_c
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
    AND CAST(l_shipdate AS DATE) <  DATE '1998-01-01'
  GROUP BY l_partkey, l_suppkey
),
pt AS (SELECT l_partkey, CAST(SUM(supp_qty_c) AS BIGINT) AS part_qty_c FROM sq GROUP BY l_partkey)
SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_parts_dominated
FROM sq JOIN pt USING (l_partkey)
        JOIN supplier ON sq.l_suppkey = s_suppkey
WHERE 2 * supp_qty_c > part_qty_c
GROUP BY s_suppkey, s_name
""",
)
def q20_dominant_suppliers(spark, sf_dir):
    """TPC-H Q20 (potential part promotion) shape: suppliers who
    shipped the majority (>50%) of a red part's 1997 volume (availqty
    vs half-of-sold, proxied by supplier share vs part total).  The
    per-part total re-aggregates the already-aggregated (part, supp)
    rollup — second aggregate's input is the first's output, not the
    fact table — and the majority test is integer (2·supp > total)."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date"))
    )
    qty_c = F.floor(F.col("l_quantity") * F.lit(100.0)).cast("long")
    sq = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(qty_c).alias("supp_qty_c"))
    )
    pt = sq.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("supp_qty_c").alias("part_qty_c")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        sq.join(pt, sq.l_partkey == pt.pk)
        .where(F.lit(2) * F.col("supp_qty_c") > F.col("part_qty_c"))
        .join(F.broadcast(supp), sq.l_suppkey == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_parts_dominated"))
    )


@query(
    "q21_waiting_suppliers",
    r"""
SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON l1.l_orderkey = o_orderkey
WHERE o_orderstatus = 'F'
  AND CAST(l1.l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 90
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND CAST(l3.l_shipdate AS DATE) > CAST(o3.o_orderdate AS DATE) + 90)
GROUP BY s_suppkey, s_name
""",
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting): the sole late
    supplier on a multi-supplier finished order; "late" is proxied by
    shipdate > orderdate + 90d (no receipt/commit dates).

    Scale rewrite: the classic formulation is TWO lineitem self-joins
    (EXISTS + NOT EXISTS — the oracle SQL keeps that form to prove
    equivalence).  Here both existentials collapse into ONE per-order
    aggregate — n_supp ≥ 2 ∧ n_late_supp = 1 — so lineitem is scanned
    once and shuffled once on orderkey instead of three scans and two
    self-join shuffles; numwait then counts the sole-late supplier's
    late lines (l1 multiplicity) via n_late_lines."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate").cast("date")
            > F.date_add(F.col("o_orderdate").cast("date"), 90)
        ).alias("is_late"),
    )
    per_order = j.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late_supp"),
        F.max(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("late_supp"),
        F.sum(F.when(F.col("is_late"), 1).otherwise(0)).alias("n_late_lines"),
    )
    sole = per_order.where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        sole.join(F.broadcast(supp), sole.late_supp == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
    )


@query(
    "q2_min_balance_supplier",
    r"""
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
),
eu AS (
  SELECT s_suppkey, s_name, CAST(floor(s_acctbal * 100.0) AS BIGINT) AS bal_c
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
cand AS (SELECT l_partkey, s_suppkey, s_name, bal_c FROM ps JOIN eu ON l_suppkey = s_suppkey)
SELECT l_partkey, s_suppkey, s_name, bal_c
FROM cand
WHERE bal_c = (SELECT MIN(c2.bal_c) FROM cand c2 WHERE c2.l_partkey = cand.l_partkey)
""",
)
def q2_min_balance_supplier(spark, sf_dir):
    """TPC-H Q2 (minimum-cost supplier) shape: for each mid-size
    STANDARD part, the EUROPE supplier(s) with the minimum account
    balance among those who actually shipped it (no partsupp, so the
    part↔supplier relation is lineitem's distinct pairs and supplycost
    is proxied by s_acctbal).  The correlated MIN is a window over the
    candidate set — one shuffle on partkey, no re-join of the
    aggregate; the supplier/nation/region side broadcasts."""
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    )
    eu_n = _nations_of_region(spark, sf_dir, "EUROPE")
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(eu_n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.floor(F.col("s_acctbal") * F.lit(100.0)).cast("long").alias("bal_c"),
        )
    )
    li = load_table(spark, sf_dir, "lineitem")
    ps = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    cand = ps.join(F.broadcast(eu), ps.l_suppkey == eu.s_suppkey)
    w = Window.partitionBy("l_partkey")
    return (
        cand.withColumn("min_bal", F.min("bal_c").over(w))
        .where(F.col("bal_c") == F.col("min_bal"))
        .select("l_partkey", "s_suppkey", "s_name", "bal_c")
    )


@query(
    "bloom_semi_join_lineitem",
    r"""
SELECT l_returnflag,
       CAST(SUM(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS revenue_c,
       count(*) AS n_rows
FROM lineitem
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_orderkey = l_orderkey AND o_totalprice > 450000)
GROUP BY l_returnflag
""",
)
def bloom_semi_join_lineitem(spark, sf_dir):
    """Runtime-filtered semi join (`operators/bloomjoin.py`): revenue of
    lineitems belonging to high-value orders.  The order-key set folds
    into a 2^20-bit bloom filter (128 KiB), the probe side is pruned
    map-only inside its scan stage, and the exact semi join then runs on
    the survivors — result-identical to the oracle's plain EXISTS (the
    verify join removes bloom false positives), but the fact-table
    shuffle carries only ~the matching fraction at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    j = bloom_semi_join(li, orders, "l_orderkey", "o_orderkey")
    return j.groupBy("l_returnflag").agg(
        F.sum(F.floor(F.col("l_extendedprice") * F.lit(100.0)).cast("long")).alias(
            "revenue_c"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )
