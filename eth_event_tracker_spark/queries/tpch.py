"""TPC-H completion: the 14 queries not already in relational.py —
together with Q1/Q3/Q5/Q10/Q12/Q14/Q18/Q19 this covers all 22, i.e. the
full standard decorrelation matrix (EXISTS → semi, NOT EXISTS → anti,
correlated scalar MIN/AVG subqueries → agg-then-join, IN / NOT IN,
scalar-threshold subqueries → broadcast scalar, view-over-view).

The fixtures are reduced TPC-H (TESTDATA.md): no partsupp, no
l_commitdate / l_receiptdate / l_shipmode, no phone/comment columns — so
each query keeps its reference SHAPE with adapted predicates, like the
existing "Q12-style"/"Q19-style" entries:
- the part-supplier relation is DERIVED from lineitem (distinct
  (l_partkey, l_suppkey), unit cost = MIN(extendedprice/quantity)) —
  at 100 TB this is a materialized dimension, computed once;
- "late line" (Q4/Q21's commit<receipt) → l_returnflag = 'R';
- Q22's country code → the customer's nation; "no orders" (everyone
  orders in these fixtures) → no orders since 2000-01-01;
- literal nation/region picks are constrained to be NON-EMPTY at every
  fixture SF (sf0.001 has only 10 suppliers over 25 nations, so Q20/Q21
  use nations that have suppliers there, and Q7 pairs REGIONS).

Determinism conventions (queries/__init__): decimal-cast double sums,
BIGINT counts, and exact integer arithmetic for threshold comparisons
(quantities are integral in TPC-H, so CAST AS BIGINT is lossless —
asserted in tests) because a float threshold like `x < 0.2*avg` rounds
differently across engines exactly at the boundary.

Scale notes per query are inline; the shared discipline: dims broadcast,
facts shuffle at most once on their join key, scalar thresholds ride a
broadcast, and every aggregate is partial+final by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from . import register
from .relational import _REV_SQL, _revenue


def _qty_i():
    """Exact integer quantity (TPC-H quantities are integral 1..50)."""
    return F.col("l_quantity").cast("bigint")


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier: the correlated-MIN-subquery shape,
# decorrelated to agg-then-equality-join on (part, mincost).
# ---------------------------------------------------------------------------
@register(
    "q2_min_cost_supplier",
    """
WITH ps AS (SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS cost
            FROM lineitem GROUP BY 1, 2),
     eu AS (SELECT s_suppkey, s_acctbal, s_name, n_name
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE')
SELECT s_acctbal, s_name, n_name, ps.l_partkey AS p_partkey, cost
FROM part JOIN ps ON p_partkey = ps.l_partkey JOIN eu ON eu.s_suppkey = ps.l_suppkey
WHERE p_size <= 10 AND p_type = 'STANDARD'
  AND cost = (SELECT MIN(ps2.cost) FROM ps ps2 JOIN eu eu2 ON eu2.s_suppkey = ps2.l_suppkey
              WHERE ps2.l_partkey = ps.l_partkey)
ORDER BY s_acctbal DESC, p_partkey, s_name
LIMIT 100
""",
    doc="TPC-H Q2-style min-cost supplier: correlated MIN subquery decorrelated to agg + equality join (reference shape, partsupp derived from lineitem)",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    parts = (
        load_table(spark, sf_dir, "part")
        .where((F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey")
    )
    # derived part-supplier relation (at 100 TB: a maintained dimension)
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    eu = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    # prune FIRST: qualifying parts and EU suppliers are both broadcast,
    # so the big derived relation never shuffles for them
    eup = ps.join(F.broadcast(parts), ps.l_partkey == parts.p_partkey).drop(
        "p_partkey"
    ).join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
    mins = eup.groupBy(F.col("l_partkey").alias("_pk")).agg(F.min("cost").alias("_mincost"))
    # NO explicit broadcast on mins: it has one row per QUALIFYING part,
    # which at 100 TB can be millions — AQE picks broadcast only when the
    # runtime size allows (at these fixtures it does)
    return (
        eup.join(
            mins,
            (eup.l_partkey == F.col("_pk")) & (eup.cost == F.col("_mincost")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", F.col("l_partkey").alias("p_partkey"), "cost"
        )
        .orderBy(F.desc("s_acctbal"), "p_partkey", "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q4 — order priority checking: EXISTS → left-semi join
# ---------------------------------------------------------------------------
@register(
    "q4_order_priority",
    """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4-style EXISTS decorrelated to a left-semi join ('late' = returned line)",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    late = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change: pure scan-side filter + one aggregate.
# The filters all push into the parquet scan; zero joins, zero shuffles
# beyond the single-row final aggregate.
# ---------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
    doc="TPC-H Q6 forecast revenue: pushed-down filters + single aggregate, no joins",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two trade partners: the n1/n2 (here
# r1/r2) double-aliased dimension role join with the symmetric
# disjunctive pair predicate; region granularity keeps the result
# non-empty at every fixture SF (a single nation pair is empty at
# sf0.001 — 10 suppliers over 25 nations).
# ---------------------------------------------------------------------------
@register(
    "q7_volume_shipping",
    f"""
SELECT supp_region, cust_region, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
             EXTRACT(year FROM l_shipdate) AS l_year, {_REV_SQL} AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      WHERE ((r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA')
          OR (r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE'))
        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31')
GROUP BY supp_region, cust_region, l_year
""",
    doc="TPC-H Q7 volume shipping: dual-role region dims, symmetric disjunctive pair predicate",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") <= F.lit("1996-12-31"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name").isin("EUROPE", "ASIA"))
    # both region roles pre-filtered to the pair — the facts only carry
    # rows for the two regions through the join (25-row dim, broadcast)
    nr = nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey).select(
        "n_nationkey", "r_name"
    )
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nr.select(F.col("n_nationkey").alias("_n1k"), F.col("r_name").alias("supp_region"))),
        F.col("s_nationkey") == F.col("_n1k"),
    ).select("s_suppkey", "supp_region")
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nr.select(F.col("n_nationkey").alias("_n2k"), F.col("r_name").alias("cust_region"))),
        F.col("c_nationkey") == F.col("_n2k"),
    ).select("c_custkey", "cust_region")
    return (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("supp_region") != F.col("cust_region"))
        .groupBy("supp_region", "cust_region", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — market share: ratio of conditional decimal aggregates per year,
# two nation roles (market region via customer, share nation via supplier)
# ---------------------------------------------------------------------------
@register(
    "q8_market_share",
    f"""
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (SELECT EXTRACT(year FROM o_orderdate) AS o_year, {_REV_SQL} AS volume, n2.n_name AS nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31')
GROUP BY o_year
""",
    doc="TPC-H Q8 market share: conditional/total decimal aggregate ratio per year",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY").select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31"))
    )
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_nat = nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey).select(
        F.col("n_nationkey").alias("_ank")
    )
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(asia_nat), F.col("c_nationkey") == F.col("_ank")
    ).select("c_custkey")
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat.select(F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("nation"))),
        F.col("s_nationkey") == F.col("_snk"),
    ).select("s_suppkey", "nation")
    vol = _revenue()
    joined = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    share = F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0).cast("decimal(18,4)"))
    return joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        (F.sum(share).cast("double") / F.sum(vol).cast("double")).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Q9 — product type profit: profit = revenue − derived supply cost
# (0.1 · p_retailprice · quantity stands in for ps_supplycost · quantity)
# ---------------------------------------------------------------------------
@register(
    "q9_product_profit",
    """
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) - CAST(0.1 AS DOUBLE) * p_retailprice * l_quantity
                  AS DECIMAL(18,4)) AS amount
      FROM part JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%')
GROUP BY nation, o_year
""",
    doc="TPC-H Q9 product profit by supplier nation × year (supply cost derived from p_retailprice)",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nat = load_table(spark, sf_dir, "nation")
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q11 — important stock: scalar-threshold subquery.  The original's
# fixed fraction is scale-dependent (0.0001/SF); the scale-free form —
# value > 2 × mean value — compares in DOUBLE over inputs that are
# bit-identical on both engines (decimal sums), so the boundary is
# deterministic.  The (total, n) scalar rides a broadcast.
# ---------------------------------------------------------------------------
@register(
    "q11_important_stock",
    """
WITH vals AS (SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS v
              FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
              JOIN nation ON n_nationkey = s_nationkey
              JOIN region ON r_regionkey = n_regionkey
              WHERE r_name = 'AFRICA' GROUP BY 1),
     tot AS (SELECT CAST(SUM(v) AS DOUBLE) AS t, COUNT(*) AS n FROM vals)
SELECT l_partkey AS p_partkey, CAST(v AS DOUBLE) AS stock_value
FROM vals, tot
WHERE CAST(v AS DOUBLE) * CAST(n AS DOUBLE) > CAST(2 AS DOUBLE) * t
""",
    doc="TPC-H Q11-style scalar-threshold subquery (scale-free 2×-mean form, broadcast scalar)",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AFRICA")
    af_sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    vals = (
        li.join(F.broadcast(af_sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("v"))
    )
    tot = vals.agg(
        F.sum("v").cast("double").alias("t"), F.count("*").alias("n")
    )
    return (
        vals.crossJoin(F.broadcast(tot))
        .where(
            F.col("v").cast("double") * F.col("n").cast("double")
            > F.lit(2).cast("double") * F.col("t")
        )
        .select(F.col("l_partkey").alias("p_partkey"), F.col("v").cast("double").alias("stock_value"))
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: LEFT OUTER with an ON-clause
# filter (NOT a WHERE — customers with zero matching orders must survive
# with count 0), then a second aggregate over the first.
# ---------------------------------------------------------------------------
@register(
    "q13_customer_distribution",
    """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey)
GROUP BY c_count
""",
    doc="TPC-H Q13 customer distribution: left-outer with ON-clause predicate + double aggregate",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# Q15 — top supplier: the revenue view + scalar MAX subquery; equality
# on a double that both engines derive from the same decimal sum.
# ---------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    f"""
WITH revenue AS (SELECT l_suppkey AS supplier_no, CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
                 FROM lineitem
                 WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
                 GROUP BY 1)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    doc="TPC-H Q15 top supplier: view + scalar MAX subquery as broadcast scalar",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue()).cast("double").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(sup), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship: COUNT(DISTINCT) over the derived
# part-supplier relation, NOT IN → broadcast left-anti join.
# ---------------------------------------------------------------------------
@register(
    "q16_parts_supplier_relation",
    """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = ps.l_partkey
WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
    doc="TPC-H Q16-style distinct-supplier counting with NOT IN → anti join (partsupp derived)",
)
def q16_parts_supplier_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    parts = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity revenue: correlated AVG subquery, decorrelated to
# per-part aggregate + join; the 0.2·avg threshold is evaluated in EXACT
# integer arithmetic (qty·5·n < sum ⟺ qty < 0.2·avg) because a float
# threshold rounds differently across engines at the boundary.
# ---------------------------------------------------------------------------
@register(
    "q17_small_qty_revenue",
    """
WITH pq AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
     a AS (SELECT l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS qsum, COUNT(*) AS qn
           FROM lineitem JOIN pq ON p_partkey = l_partkey GROUP BY 1)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / CAST(7 AS DOUBLE) AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem l JOIN a ON a.l_partkey = l.l_partkey
WHERE CAST(l_quantity AS BIGINT) * 5 * qn < qsum
""",
    doc="TPC-H Q17 small-quantity orders: correlated AVG decorrelated, exact-integer threshold",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pq = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23").select(
        "p_partkey"
    )
    li23 = li.join(F.broadcast(pq), F.col("l_partkey") == F.col("p_partkey")).drop("p_partkey")
    agg = li23.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum(_qty_i()).alias("qsum"), F.count("*").alias("qn")
    )
    return (
        li23.join(agg, F.col("l_partkey") == F.col("_pk"))
        .where(_qty_i() * 5 * F.col("qn") < F.col("qsum"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double") / F.lit(7).cast("double")).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion: nested IN subqueries → semi-join chain
# over the derived shipped-quantity relation; exact-integer halving test.
# ---------------------------------------------------------------------------
@register(
    "q20_part_promotion",
    """
WITH shipped AS (SELECT l_partkey, l_suppkey,
                        SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
                                 THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS q96,
                        SUM(CAST(l_quantity AS BIGINT)) AS qall
                 FROM lineitem GROUP BY 1, 2)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_3', 'NATION_8')
  AND s_suppkey IN (SELECT l_suppkey FROM shipped JOIN part ON p_partkey = l_partkey
                    WHERE p_type = 'SMALL' AND q96 * 2 > qall)
""",
    doc="TPC-H Q20-style nested IN → semi-join chain over derived shipped-qty relation",
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    in96 = (F.col("l_shipdate") >= F.lit("1996-01-01")) & (
        F.col("l_shipdate") < F.lit("1997-01-01")
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.when(in96, _qty_i()).otherwise(F.lit(0))).alias("q96"),
        F.sum(_qty_i()).alias("qall"),
    )
    small = load_table(spark, sf_dir, "part").where(F.col("p_type") == "SMALL").select(
        "p_partkey"
    )
    qual = (
        shipped.join(F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"))
        .where(F.col("q96") * 2 > F.col("qall"))
        .select("l_suppkey")
    )
    nat = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_8")
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qual, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting.  Both correlated subqueries
# are ORDER-level facts: EXISTS(other supplier) ⟺ the order has ≥2
# distinct suppliers (min≠max), NOT EXISTS(other R-supplier) ⟺ the
# order has exactly ONE distinct R-supplier (min_r = max_r) — and for a
# qualifying order that lone R-supplier IS every qualifying row's
# supplier, so numwait = Σ per-order R-row counts grouped by it.  One
# groupBy(l_orderkey) therefore replaces the semi+anti self-joins: at
# 100 TB lineitem is shuffled ONCE (map-side partial min/max/sum), vs
# three l_orderkey exchanges in the naive plan (round-6 advice #2);
# plan-asserted in tests/test_tpch.py.
# ---------------------------------------------------------------------------
@register(
    "q21_suppliers_waiting",
    """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' AND n_name IN ('NATION_12', 'NATION_13', 'NATION_15')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    doc="TPC-H Q21 waiting suppliers: both correlated subqueries folded into one per-order aggregate (single lineitem shuffle)",
)
def q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    nat = load_table(spark, sf_dir, "nation").where(F.col("n_name").isin("NATION_12", "NATION_13", "NATION_15"))
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    fo = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    r_supp = F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
    stats = li.groupBy("l_orderkey").agg(
        F.min("l_suppkey").alias("_mn"),
        F.max("l_suppkey").alias("_mx"),
        F.min(r_supp).alias("_mnr"),
        F.max(r_supp).alias("_mxr"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("_n_r_rows"),
    )
    # ≥2 distinct suppliers AND exactly one distinct R-supplier (plain
    # ==, NOT null-safe: no-R orders have NULL _mnr and must drop out)
    qual = stats.where(
        (F.col("_mn") != F.col("_mx")) & (F.col("_mnr") == F.col("_mxr"))
    ).join(fo, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    return (
        qual.join(F.broadcast(sup), F.col("_mnr") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("_n_r_rows").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity: scalar AVG threshold (broadcast) +
# NOT EXISTS → anti join; country code adapted to the customer's nation,
# "no orders" to "no orders since 2000" (every fixture customer orders).
# ---------------------------------------------------------------------------
@register(
    "q22_global_sales",
    """
WITH avg_bal AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS a
                 FROM customer WHERE c_acctbal > CAST(0 AS DOUBLE))
SELECT n_name AS cntry, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey, avg_bal
WHERE n_name IN ('NATION_1', 'NATION_3', 'NATION_5', 'NATION_7', 'NATION_9')
  AND c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n_name
""",
    doc="TPC-H Q22 sales opportunity: broadcast scalar AVG threshold + NOT EXISTS anti join",
)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.where(F.col("c_acctbal") > F.lit(0).cast("double")).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double") / F.count("*")).alias("a")
    )
    nat = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_3", "NATION_5", "NATION_7", "NATION_9")
    )
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("n_name").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double").alias("totacctbal"),
        )
    )
