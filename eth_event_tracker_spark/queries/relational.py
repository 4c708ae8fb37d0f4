"""Relational surface over the TPC-H-ish fixtures (SURVEY §2 Part B).

The reference has no SQL engine; these queries are the standard
relational-operator categories our engine must expose over tracked tables
(joins incl. broadcast/semi/anti, hash aggregations, grouping sets,
windows, sort/limit top-k, set ops, pivot) — all pure Catalyst plans.

Scale discipline (100 TB):
- dims (region/nation/supplier/part) are broadcast — no shuffle of the
  fact side for those joins;
- aggregates are partial+final (map-side combine) by construction;
- top-k is orderBy+limit → TakeOrdered (no global sort materialization);
- every SUM over doubles goes through DECIMAL(18,4) for engine-portable
  determinism (see queries/__init__ docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from . import register

_DEC = "CAST(SUM(CAST({x} AS DECIMAL(18,4))) AS DOUBLE)"


def _sum_dec(col):
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18,4)")).cast("double")


def _revenue():
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")


_REV_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"


# ---------------------------------------------------------------------------
# TPC-H Q1 — pricing summary: the canonical hash-agg with partial combine
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    f"""
SELECT l_returnflag, l_linestatus,
       {_DEC.format(x='l_quantity')} AS sum_qty,
       {_DEC.format(x='l_extendedprice')} AS sum_base_price,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS sum_disc_price,
       {_DEC.format(x='l_quantity')} / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 pricing summary (hash agg, map-side partials)",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("1998-09-02"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _sum_dec("l_quantity").alias("sum_qty"),
        _sum_dec("l_extendedprice").alias("sum_base_price"),
        F.sum(_revenue()).cast("double").alias("sum_disc_price"),
        (_sum_dec("l_quantity") / F.count("*")).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 — shipping priority: fact-fact join + top-k
# ---------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    f"""
SELECT l.l_orderkey AS l_orderkey,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
       o.o_orderdate AS o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    doc="TPC-H Q3 shipping priority (join + agg + TakeOrdered top-k)",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1997-01-01"))
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1997-01-01"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


# ---------------------------------------------------------------------------
# Broadcast dimension join chain: region ⋈ nation ⋈ customer ⋈ orders
# ---------------------------------------------------------------------------
@register(
    "join_broadcast_dims",
    """
SELECT r.r_name AS region, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY r.r_name
""",
    doc="star join with explicit broadcast of region/nation/customer dims — zero fact shuffle pre-agg",
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    # broadcast the dim chain: at 100 TB the orders fact never shuffles for
    # these joins — each task streams facts against an in-memory dim map
    dims = F.broadcast(
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
            F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
        ).select("c_custkey", "r_name")
    )
    return (
        o.join(dims, o.o_custkey == F.col("c_custkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_orders"),
            _sum_dec("o_totalprice").alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# Semi / anti joins (reorg-diff style membership tests at relational scale)
# ---------------------------------------------------------------------------
@register(
    "join_semi_anti",
    """
SELECT 'with_orders' AS cohort, COUNT(*) AS n_customers
FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT 'without_orders' AS cohort, COUNT(*) AS n_customers
FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    doc="left-semi + left-anti join cohorts",
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(F.count("*").alias("n_customers")).withColumn("cohort", F.lit("with_orders"))
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(F.count("*").alias("n_customers")).withColumn("cohort", F.lit("without_orders"))
    return semi.unionByName(anti).select("cohort", "n_customers")


# ---------------------------------------------------------------------------
# Grouping sets: ROLLUP + CUBE over region/nation (tagged union — both
# grouping-set operators verified through one driver slot)
# ---------------------------------------------------------------------------
@register(
    "agg_rollup",
    """
WITH joined AS (
  SELECT n.n_name AS nation, r.r_name AS region, c.c_acctbal
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
)
SELECT 'rollup' AS mode, nation, region,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
FROM joined
GROUP BY ROLLUP (region, nation)
UNION ALL
SELECT 'cube' AS mode, nation, region,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
FROM joined
GROUP BY CUBE (region, nation)
""",
    doc="ROLLUP + CUBE grouping sets (region, nation) — built-in partial agg per set",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP and CUBE grouping sets over the same customer/nation/region
    dims, unioned with a `mode` tag — one driver slot verifies both."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(r, F.col("n_regionkey") == F.col("r_regionkey"))
    aggs = [F.count("*").alias("n_customers"), _sum_dec("c_acctbal").alias("sum_acctbal")]
    region = F.col("r_name").alias("region")
    nation = F.col("n_name").alias("nation")
    rolled = (
        joined.rollup(region, nation)
        .agg(*aggs)
        .select(F.lit("rollup").alias("mode"), "nation", "region", "n_customers", "sum_acctbal")
    )
    cubed = (
        joined.cube(region, nation)
        .agg(*aggs)
        .select(F.lit("cube").alias("mode"), "nation", "region", "n_customers", "sum_acctbal")
    )
    return rolled.unionByName(cubed)


# ---------------------------------------------------------------------------
# Window: top-3 orders per customer (the indx-assignment pattern generalized)
# ---------------------------------------------------------------------------
@register(
    "window_topk_per_group",
    """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
  FROM orders
)
WHERE rn <= 3
""",
    doc="per-group top-k via row_number window (partitioned — scales by key)",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# ---------------------------------------------------------------------------
# Window: running sum + lag per customer over order history
# ---------------------------------------------------------------------------
@register(
    "window_running_sum",
    """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
FROM orders
""",
    doc="running aggregate + lag (the parent-hash chain-check pattern, tracker.go:291-314)",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_total"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


# ---------------------------------------------------------------------------
# Global top-k: ORDER BY ... LIMIT — TakeOrdered, the S-8 pattern writ large
# ---------------------------------------------------------------------------
@register(
    "sort_limit_topk",
    """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 20
""",
    doc="S-8 ORDER BY DESC LIMIT k ≡ TakeOrdered (no global sort, per-partition heaps)",
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(20)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


# ---------------------------------------------------------------------------
# Set ops: INTERSECT / EXCEPT with distinct semantics
# ---------------------------------------------------------------------------
@register(
    "set_ops_customers",
    """
SELECT 'building_with_bigorder' AS cohort, COUNT(*) AS n FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_totalprice > 100000
)
UNION ALL
SELECT 'building_without_bigorder' AS cohort, COUNT(*) AS n FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_totalprice > 100000
)
""",
    doc="intersect/except distinct set ops",
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("k"))
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000).select(F.col("o_custkey").alias("k"))
    a = c.intersect(o).agg(F.count("*").alias("n")).withColumn("cohort", F.lit("building_with_bigorder"))
    b = c.exceptAll(o.distinct()).distinct().agg(F.count("*").alias("n")).withColumn("cohort", F.lit("building_without_bigorder"))
    return a.unionByName(b).select("cohort", "n")


# ---------------------------------------------------------------------------
# Distinct aggregation (exact) — address-cardinality style; folded into the
# `stats_order_values` driver slot (crossJoin of two single-row aggregates)
# ---------------------------------------------------------------------------
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_distinct_orders"),
    )


# ---------------------------------------------------------------------------
# Approx distinct (HLL) — the 100 TB path for part cardinality.
# Registered ROWS-ONLY *after* the 50 oracle-bearing entries: HLL output is
# approximate by construction, so no SQL oracle can hash-match it — but a
# driver whose window extends past 50 still exercises it as a rows-only
# check (round-4 advice).  pytest pins the estimate within rsd against the
# exact count (test_registry extras check); bench.py times it.
# ---------------------------------------------------------------------------
@register("approx_distinct_parts", None, "HLL approx distinct vs exact (rows-only extra)")
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_n_parts"),
        F.countDistinct("l_partkey").alias("exact_n_parts"),
    )


# ---------------------------------------------------------------------------
# Pivot: orderstatus × orderpriority counts
# ---------------------------------------------------------------------------
@register(
    "pivot_orderstatus",
    """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
FROM orders
GROUP BY o_orderpriority
""",
    doc="pivot with explicit value list (no extra pass to discover values)",
)
def pivot_orderstatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    )


# ---------------------------------------------------------------------------
# Unpivot: wide per-nation stats → long (measure, value) rows — the
# inverse of pivot_orderstatus.  Spark: stack(); SQL: UNION ALL (the
# engine-portable UNPIVOT).  stack is a generator expression: one pass
# over the aggregated (tiny) wide table, no shuffle beyond the agg.
# ---------------------------------------------------------------------------
@register(
    "stats_unpivot",
    """
WITH s AS (
  SELECT n_name,
         CAST(COUNT(*) AS DOUBLE) AS n_customers,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal,
         round(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 9) AS avg_acctbal
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, 'n_customers' AS measure, n_customers AS value FROM s
UNION ALL SELECT n_name, 'total_acctbal', total_acctbal FROM s
UNION ALL SELECT n_name, 'avg_acctbal', avg_acctbal FROM s
""",
    doc="unpivot (stack) of per-nation customer stats to (measure, value) rows — "
    "the inverse of pivot_orderstatus; decimal-exact sums per the float convention",
)
def stats_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    dec_sum = F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
    wide = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count("*").cast("double").alias("n_customers"),
            dec_sum.alias("total_acctbal"),
            F.round(dec_sum / F.count("*"), 9).alias("avg_acctbal"),
        )
    )
    return wide.selectExpr(
        "n_name",
        "stack(3, 'n_customers', n_customers, 'total_acctbal', total_acctbal, "
        "'avg_acctbal', avg_acctbal) AS (measure, value)",
    )


# ---------------------------------------------------------------------------
# TPC-H Q5-style — local supplier volume: region-filtered 6-way join with
# the supplier-nation = customer-nation co-location predicate
# ---------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    f"""
SELECT n.n_name AS nation,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY n.n_name
""",
    doc="TPC-H Q5: region-filtered 6-way join, broadcast dims, co-location predicate",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") >= F.lit("1996-01-01"))
    l = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s, (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(n, n.n_nationkey == s.s_nationkey)
        .join(r, r.r_regionkey == n.n_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Correlated pattern — orders above their customer's average order value
# (decorrelated as a window aggregate: one pass, no per-row subquery)
# ---------------------------------------------------------------------------
@register(
    "orders_above_customer_avg",
    """
WITH enriched AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg,
         COUNT(*) OVER (PARTITION BY o_custkey) AS cust_n
  FROM orders
)
SELECT o_custkey, COUNT(*) AS n_above
FROM enriched
WHERE cust_n >= 2 AND o_totalprice > cust_avg
GROUP BY o_custkey
""",
    doc="correlated scalar subquery decorrelated to a window aggregate",
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    enriched = o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("cust_avg"),
        F.count("*").over(w).alias("cust_n"),
    )
    return (
        enriched.where((F.col("cust_n") >= 2) & (F.col("o_totalprice") > F.col("cust_avg")))
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_above"))
    )


# ---------------------------------------------------------------------------
# Statistical aggregates: exact quantiles (sort-based), decimal-exact
# stddev (computed from exact sums, not streaming float accumulation),
# and an arithmetic histogram
# ---------------------------------------------------------------------------
@register(
    "stats_order_values",
    """
WITH s AS (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sm,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4)) * CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS sq,
         COUNT(*) AS n,
         round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5), 6) AS median_price,
         round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9), 6) AS p90_price
  FROM orders
),
d AS (
  SELECT COUNT(DISTINCT l_partkey) AS n_parts,
         COUNT(DISTINCT l_suppkey) AS n_supps,
         COUNT(DISTINCT l_orderkey) AS n_distinct_orders
  FROM lineitem
)
SELECT n AS n_orders, median_price, p90_price,
       round(sqrt((sq - sm * sm / n) / (n - 1)), 6) AS stddev_price,
       n_parts, n_supps, n_distinct_orders
FROM s CROSS JOIN d
""",
    doc="exact quantiles + decimal-exact sample stddev + exact multi distinct-count (single-row crossJoin)",
)
def stats_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,4)")
    dec_w = F.col("o_totalprice").cast("decimal(28,4)")
    s = o.agg(
        F.sum(dec).cast("double").alias("sm"),
        F.sum(dec_w * dec_w).cast("double").alias("sq"),
        F.count("*").alias("n"),
        F.round(F.expr("percentile(CAST(o_totalprice AS DOUBLE), 0.5)"), 6).alias("median_price"),
        F.round(F.expr("percentile(CAST(o_totalprice AS DOUBLE), 0.9)"), 6).alias("p90_price"),
    )
    stats = s.select(
        F.col("n").alias("n_orders"),
        "median_price",
        "p90_price",
        F.round(F.sqrt((F.col("sq") - F.col("sm") * F.col("sm") / F.col("n")) / (F.col("n") - 1)), 6).alias("stddev_price"),
    )
    # single-row × single-row — Catalyst broadcasts; no data movement
    return stats.crossJoin(distinct_counts(spark, sf_dir))


# ---------------------------------------------------------------------------
# Histogram: fixed-width price buckets (portable floor arithmetic)
# ---------------------------------------------------------------------------
@register(
    "histogram_order_price",
    """
SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
       COUNT(*) AS n_orders,
       CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
       CAST(MAX(o_totalprice) AS DOUBLE) AS hi
FROM orders
GROUP BY 1
""",
    doc="fixed-width histogram via floor bucketing",
)
def histogram_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("bucket", F.floor(F.col("o_totalprice") / 50000).cast("long"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# Range (interval) join: shipments falling inside each order's 7-day
# fulfilment window, matched on TIME ONLY (no equality key exists, so a
# naive encoding is a cross join).  Spark side: operators/rangejoin.py's
# binned equality join; DuckDB side: its native inequality join (IEJoin).
# Empty windows are kept as zero rows via a broadcast-sized join of the
# aggregate back onto the interval table.
# ---------------------------------------------------------------------------
@register(
    "range_join_ship_windows",
    """
WITH iv AS (
  SELECT o_orderkey, o_orderdate AS w_start,
         o_orderdate + INTERVAL 7 DAY AS w_end
  FROM orders WHERE o_orderkey % 100 = 0
),
m AS (
  SELECT iv.o_orderkey, COUNT(*) AS n_shipped,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
  FROM iv JOIN lineitem l
    ON l.l_shipdate >= iv.w_start AND l.l_shipdate < iv.w_end
  GROUP BY iv.o_orderkey
)
SELECT iv.o_orderkey, COALESCE(m.n_shipped, 0) AS n_shipped,
       COALESCE(m.sum_price, 0.0) AS sum_price
FROM iv LEFT JOIN m USING (o_orderkey)
""",
    doc="range join (point-in-interval, no equality key) as a binned "
    "equality join + refine — never a cross product; empty windows kept",
)
def range_join_ship_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import binned_interval_join

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    intervals = o.where(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.col("o_orderdate").alias("w_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("w_end"),
    )
    points = li.select("l_shipdate", "l_extendedprice")
    joined = binned_interval_join(
        points, intervals, "l_shipdate", "w_start", "w_end", bin_width=7 * 86400
    )
    agg = joined.groupBy("o_orderkey").agg(
        F.count("*").alias("n_shipped"),
        _sum_dec("l_extendedprice").alias("sum_price"),
    )
    return (
        intervals.select("o_orderkey")
        .join(agg, "o_orderkey", "left")
        .select(
            "o_orderkey",
            F.coalesce(F.col("n_shipped"), F.lit(0)).alias("n_shipped"),
            F.coalesce(F.col("sum_price"), F.lit(0.0)).alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 — returned-item reporting: the canonical "top offenders"
# shape (fact-fact join + broadcast dim + agg + TakeOrdered top-k).
# 100 TB: lineitem and orders co-shuffle once on orderkey; customer joins
# on the AGGREGATED (custkey-grouped) side; nation is broadcast.
# ---------------------------------------------------------------------------
@register(
    "q10_returned_items",
    f"""
SELECT c.c_custkey, c.c_name,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    doc="TPC-H Q10 returned items (fact-fact orderkey join, dim broadcast, top-20)",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    per_cust = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 — large-volume orders: the HAVING-subquery decorrelation
# shape.  The qualifying orderkeys come from ONE aggregate over lineitem
# (map-side combine), then semi-filter orders via an equality join —
# never a correlated per-row subquery.
# ---------------------------------------------------------------------------
@register(
    "q18_large_orders",
    """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 250)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
""",
    doc="TPC-H Q18 large orders (HAVING-subquery decorrelated to a semi join)",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(_sum_dec("l_quantity").alias("sum_qty"), F.sum("l_quantity").alias("_raw"))
        .where(F.col("_raw") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


# ---------------------------------------------------------------------------
# Count-min sketch in its exactness regime: estimates for every p_brand
# from the d×w counter grid vs the true GROUP BY counts.  A CMS estimate
# is exact unless a key pair collides in ALL d hash rows (min-of-rows);
# on this 25-key domain at w=8192 the worst is one colliding pair in ONE
# row, so the hash match against the exact oracle verifies the sketch's
# build+merge+estimate arithmetic end-to-end.  The error-regime bounds
# (overestimate-only, ε·N) are pinned in tests/test_sketches.py.
# ---------------------------------------------------------------------------
@register(
    "cms_brand_frequencies",
    """
SELECT p_brand, COUNT(*) AS est
FROM part GROUP BY p_brand
""",
    doc="count-min sketch point estimates == exact counts in the collision-free-min regime",
)
def cms_brand_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import cms_build, cms_estimate

    part = load_table(spark, sf_dir, "part")
    sketch = cms_build(part, "p_brand", d=4, w=8192)
    brands = part.select("p_brand").distinct()
    return cms_estimate(sketch, brands, "p_brand", d=4, w=8192)


# ---------------------------------------------------------------------------
# CMS join-cardinality estimation (operators/sketches.py cms_join_size) in
# its exactness regime: the self-join blowup Σ n_k² of events on
# event_type — 5 keys at w=8192, so at least one of the d=4 rows is
# collision-free and the min-of-inner-products equals the exact count.
# This is the planner-side use of the sketch: seeing a skewed join's
# output size from d·w counters without scanning either input.  The
# error regime (overestimate-only) is pinned in tests/test_sketches.py.
# ---------------------------------------------------------------------------
@register(
    "cms_join_size_events",
    """
SELECT CAST(SUM(n * n) AS BIGINT) AS est_pairs
FROM (SELECT COUNT(*) AS n FROM events GROUP BY event_type) t
""",
    doc="CMS inner-product join-size estimate == exact self-join cardinality "
    "in the collision-free-min regime — sketch-based join planning "
    "(skew-blowup detection) from d·w counters, no data scan",
)
def cms_join_size_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import cms_build, cms_join_size

    ev = load_table(spark, sf_dir, "events")
    sketch = cms_build(ev, "event_type", d=4, w=8192)
    return cms_join_size(sketch, sketch)


# ---------------------------------------------------------------------------
# TPC-H Q12 — shipmode priority counts: conditional aggregation (the
# CASE-inside-SUM shape) after a fact-fact join filtered on the fact side.
# ---------------------------------------------------------------------------
@register(
    "q12_shipmode_priority",
    """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'N'
GROUP BY l.l_linestatus
""",
    doc="TPC-H Q12-style conditional aggregation over a fact-fact join",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_returnflag") == "N")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 — promo revenue share: two conditional decimal sums in one
# aggregate, divided — the ratio-of-aggregates shape (exact decimal
# sums, then ONE correctly-rounded double division on both engines).
# ---------------------------------------------------------------------------
@register(
    "q14_promo_effect",
    f"""
SELECT CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%' THEN {_REV_SQL} ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(SUM({_REV_SQL}) AS DOUBLE) * 100.0 AS promo_pct,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate < TIMESTAMP '1996-04-01'
""",
    doc="TPC-H Q14 promo share: ratio of conditional decimal aggregates, part side broadcast",
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = _revenue()
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (F.sum(promo).cast("double") / F.sum(rev).cast("double") * 100.0).alias("promo_pct"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Exact grouped quantiles: percentile (exact linear interpolation) per
# priority class.  At 100 TB the same query swaps percentile for
# percentile_approx — a MERGEABLE sketch aggregate (map-side partials)
# with bounded error; the exact form is the oracle-checkable twin and
# the accuracy reference the approx tier is tested against.
# ---------------------------------------------------------------------------
@register(
    "stats_quantiles",
    """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
       round(quantile_cont(o_totalprice, 0.90), 4) AS p90,
       COUNT(*) AS n
FROM orders GROUP BY o_orderpriority
""",
    doc="exact grouped quantiles (interpolated percentile), approx-sketch twin in tests",
)
def stats_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    aggs = [
        F.round(F.expr(f"percentile(o_totalprice, {q})"), 4).alias(f"p{int(q*100)}")
        for q in (0.25, 0.50, 0.75, 0.90)
    ]
    return o.groupBy("o_orderpriority").agg(*aggs, F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# Heavy hitters via sketch-then-verify: CMS candidates (one-sided error
# → guaranteed superset) + exact verification of candidates only.  The
# oracle is a plain GROUP BY ... HAVING — the hash match proves the
# two-pass shape loses nothing and adds nothing, at any collision rate.
# ---------------------------------------------------------------------------
@register(
    "heavy_hitter_users",
    """
SELECT user_id, COUNT(*) AS cnt
FROM events GROUP BY user_id HAVING COUNT(*) >= 60
""",
    doc="two-pass heavy hitters: CMS candidate superset + exact verify == GROUP BY HAVING",
)
def heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import heavy_hitters

    ev = load_table(spark, sf_dir, "events")
    return heavy_hitters(ev, "user_id", min_count=60, d=4, w=4096)


# ---------------------------------------------------------------------------
# FULL OUTER join — the reconciliation shape: two filtered per-nation
# rollups outer-joined so one-sided nations survive with null-filled
# counterparts.  Completes the join-type matrix (inner/left/semi/anti/
# cross-broadcast/as-of/range/overlap/fuzzy are covered elsewhere).
# ---------------------------------------------------------------------------
@register(
    "join_full_outer",
    """
WITH hi_cust AS (
  SELECT c_nationkey AS nk, COUNT(*) AS n_rich_customers
  FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
),
lo_supp AS (
  SELECT s_nationkey AS nk, COUNT(*) AS n_poor_suppliers
  FROM supplier WHERE s_acctbal < 500 GROUP BY s_nationkey
)
SELECT COALESCE(h.nk, l.nk) AS nationkey,
       COALESCE(h.n_rich_customers, 0) AS n_rich_customers,
       COALESCE(l.n_poor_suppliers, 0) AS n_poor_suppliers,
       CAST(CASE WHEN h.nk IS NULL THEN 'supplier_only'
                 WHEN l.nk IS NULL THEN 'customer_only'
                 ELSE 'both' END AS STRING) AS presence
FROM hi_cust h FULL OUTER JOIN lo_supp l ON h.nk = l.nk
""",
    doc="FULL OUTER reconciliation of two filtered rollups (null-filled one-sided keys)",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("h_nk"))
        .agg(F.count("*").alias("n_rich_customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 500)
        .groupBy(F.col("s_nationkey").alias("l_nk"))
        .agg(F.count("*").alias("n_poor_suppliers"))
    )
    j = c.join(s, c.h_nk == s.l_nk, "full_outer")
    return j.select(
        F.coalesce("h_nk", "l_nk").alias("nationkey"),
        F.coalesce("n_rich_customers", F.lit(0)).alias("n_rich_customers"),
        F.coalesce("n_poor_suppliers", F.lit(0)).alias("n_poor_suppliers"),
        F.when(F.col("h_nk").isNull(), "supplier_only")
        .when(F.col("l_nk").isNull(), "customer_only")
        .otherwise("both")
        .alias("presence"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 — disjunctive join predicates: OR-of-ANDs over both join
# sides.  Catalyst extracts the common `l_partkey = p_partkey` equality
# into the join key and leaves the disjunction as a post-join filter —
# the optimizer shape this slot exists to pin (a naive engine treats the
# whole OR as a non-equi join condition and cross-joins).
# ---------------------------------------------------------------------------
@register(
    "q19_disjunctive_join",
    f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 15 AND l.l_quantity >= 10)
   OR (p.p_brand = 'Brand#2' AND p.p_size <= 30 AND l.l_quantity >= 20)
   OR (p.p_type = 'PROMO' AND l.l_quantity >= 40)
""",
    doc="TPC-H Q19-style OR-of-ANDs join predicate (equality extracted to the join key)",
)
def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 15) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 30) & (F.col("l_quantity") >= 20))
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 40))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(cond)
        .agg(F.sum(_revenue()).cast("double").alias("revenue"), F.count("*").alias("n_lines"))
    )


# ---------------------------------------------------------------------------
# Triangle counting (operators/graph.triangle_count) over the per-src-top-5
# co-supply graph: each supplier keeps its 5 strongest edges by
# shared-part count (density-invariant — survives corpus replication,
# unlike a global top-N or an absolute threshold), then the
# degree-oriented wedge-close count.
# Oracle mirrors the orientation exactly via row-value comparison.
# ---------------------------------------------------------------------------
@register(
    "triangle_count_cosupply",
    """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
pairs AS (SELECT a, b FROM (
            SELECT p1.l_suppkey AS a, p2.l_suppkey AS b,
                   row_number() OVER (PARTITION BY p1.l_suppkey
                                      ORDER BY COUNT(*) DESC, p2.l_suppkey) AS rn
            FROM ps p1 JOIN ps p2
              ON p1.l_partkey = p2.l_partkey AND p1.l_suppkey < p2.l_suppkey
            GROUP BY 1, 2)
          WHERE rn <= 5),
deg AS (SELECT v, COUNT(*) AS d
        FROM (SELECT a AS v FROM pairs UNION ALL SELECT b AS v FROM pairs) x
        GROUP BY v),
ori AS (SELECT CASE WHEN (da.d, pairs.a) < (db.d, pairs.b) THEN pairs.a ELSE pairs.b END AS u,
               CASE WHEN (da.d, pairs.a) < (db.d, pairs.b) THEN pairs.b ELSE pairs.a END AS w
        FROM pairs JOIN deg da ON da.v = pairs.a JOIN deg db ON db.v = pairs.b),
closed AS (SELECT 1 AS one
           FROM (SELECT o1.u, o1.w AS v1, o2.w AS v2
                 FROM ori o1 JOIN ori o2 ON o1.u = o2.u AND o1.w <> o2.w) wedges
           WHERE EXISTS (SELECT 1 FROM ori WHERE ori.u = wedges.v1 AND ori.w = wedges.v2))
SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
       (SELECT COUNT(*) FROM pairs) AS n_edges,
       (SELECT COUNT(*) FROM closed) AS n_triangles
""",
    doc="exact triangle count, degree-oriented wedge join (skew-bounded out-degree) over the per-src-top-5 co-supply pairs",
)
def triangle_count_cosupply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import triangle_count

    return triangle_count(_cosupply_edges(spark, sf_dir))


# ---------------------------------------------------------------------------
# Local clustering coefficient (operators/graph.py local_clustering):
# the per-node refinement of the triangle count — same degree-oriented
# wedge machinery, each closed wedge exploded to its three member
# nodes.  lcc = 2·tri / (d·(d−1)) is one double division of exact
# integers, so the whole profile hash-matches the oracle; degree-<2
# nodes get NULL (undefined, not zero).
# ---------------------------------------------------------------------------
@register(
    "clustering_coeff_cosupply",
    """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
pairs AS (SELECT a, b FROM (
            SELECT p1.l_suppkey AS a, p2.l_suppkey AS b,
                   row_number() OVER (PARTITION BY p1.l_suppkey
                                      ORDER BY COUNT(*) DESC, p2.l_suppkey) AS rn
            FROM ps p1 JOIN ps p2
              ON p1.l_partkey = p2.l_partkey AND p1.l_suppkey < p2.l_suppkey
            GROUP BY 1, 2)
          WHERE rn <= 5),
deg AS (SELECT v, COUNT(*) AS d
        FROM (SELECT a AS v FROM pairs UNION ALL SELECT b AS v FROM pairs) x
        GROUP BY v),
ori AS (SELECT CASE WHEN (da.d, pairs.a) < (db.d, pairs.b) THEN pairs.a ELSE pairs.b END AS u,
               CASE WHEN (da.d, pairs.a) < (db.d, pairs.b) THEN pairs.b ELSE pairs.a END AS w
        FROM pairs JOIN deg da ON da.v = pairs.a JOIN deg db ON db.v = pairs.b),
closed AS (SELECT u, v1, v2
           FROM (SELECT o1.u, o1.w AS v1, o2.w AS v2
                 FROM ori o1 JOIN ori o2 ON o1.u = o2.u AND o1.w <> o2.w) wedges
           WHERE EXISTS (SELECT 1 FROM ori WHERE ori.u = wedges.v1 AND ori.w = wedges.v2)),
tri AS (SELECT v, COUNT(*) AS n_tri FROM (
          SELECT u AS v FROM closed
          UNION ALL SELECT v1 FROM closed
          UNION ALL SELECT v2 FROM closed) t GROUP BY v)
SELECT deg.v AS node, deg.d AS degree,
       CAST(COALESCE(tri.n_tri, 0) AS BIGINT) AS n_tri,
       CASE WHEN deg.d >= 2
            THEN CAST(2 * COALESCE(tri.n_tri, 0) AS DOUBLE) / (deg.d * (deg.d - 1))
       END AS lcc
FROM deg LEFT JOIN tri ON tri.v = deg.v
""",
    doc="per-node local clustering coefficient over the per-src-top-5 co-supply "
    "pairs: degree-oriented closed wedges exploded to member nodes; "
    "lcc = 2·tri/(d·(d−1)) exact-integer division, NULL below degree 2",
)
def clustering_coeff_cosupply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import local_clustering

    return local_clustering(_cosupply_edges(spark, sf_dir))


# ---------------------------------------------------------------------------
# The remaining rank-function family in one query: ntile, rank,
# dense_rank, percent_rank, cume_dist over a deterministic total order
# (price, orderkey tiebreak).  percent_rank/cume_dist are divisions of
# exact integers — bit-identical across engines.
# ---------------------------------------------------------------------------
@register(
    "window_rank_family",
    """
SELECT o_orderkey,
       o_orderpriority,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       percent_rank() OVER w AS prnk,
       cume_dist() OVER w AS cdist
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-02-01'
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
    doc="rank-function family (ntile/rank/dense_rank/percent_rank/cume_dist) on a deterministic order",
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-02-01"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    )


# ---------------------------------------------------------------------------
# CUBE + GROUPING flags: all four aggregation levels of
# (returnflag, linestatus) in one pass — the partial-aggregate engine
# expands the grouping sets map-side; the grouping flags disambiguate
# real NULLs from rolled-up dimensions.
# ---------------------------------------------------------------------------
@register(
    "agg_cube_grouping",
    """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    doc="CUBE over (returnflag, linestatus) with GROUPING flags — all 4 levels in one pass",
)
def agg_cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count("*").alias("n_lines"),
        _sum_dec("l_quantity").alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM): the last join
# PREDICATE semantic in the matrix.  Keys are NULLIF-derived (the
# fixtures carry no NULLs): customers and suppliers bucket by
# round(acctbal/1000), negative balances collapse to NULL — a plain
# equality would silently drop the NULL bucket on both sides, <=> pairs
# them.  Null-safe equality IS a hashable key (NULL is one more key
# value), so this stays a hash join, not a nested loop — plan-linted.
# ---------------------------------------------------------------------------
@register(
    "join_null_safe",
    """
WITH cb AS (SELECT NULLIF(CAST(floor(c_acctbal / 1000) AS BIGINT), -1) AS bal_bucket,
                   COUNT(*) AS n_customers
            FROM customer GROUP BY 1),
     sb AS (SELECT NULLIF(CAST(floor(s_acctbal / 1000) AS BIGINT), -1) AS bal_bucket,
                   COUNT(*) AS n_suppliers
            FROM supplier GROUP BY 1)
SELECT cb.bal_bucket, n_customers, n_suppliers
FROM cb JOIN sb ON cb.bal_bucket IS NOT DISTINCT FROM sb.bal_bucket
""",
    doc="null-safe equality join (<=>): NULL keys pair instead of silently dropping; still a hash join",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    def buckets(table: str, pre: str, out: str):
        df = load_table(spark, sf_dir, table)
        b = F.nullif(
            F.floor(F.col(f"{pre}_acctbal") / 1000).cast("bigint"), F.lit(-1)
        ).alias("bal_bucket")
        return df.groupBy(b).agg(F.count("*").alias(out))

    cb = buckets("customer", "c", "n_customers")
    sb = buckets("supplier", "s", "n_suppliers").withColumnRenamed("bal_bucket", "_sbb")
    return cb.join(sb, cb.bal_bucket.eqNullSafe(F.col("_sbb"))).select(
        "bal_bucket", "n_customers", "n_suppliers"
    )


_COSUPPLY_CACHE: dict[tuple[str, str], DataFrame] = {}


def _cosupply_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier top-5 co-supply pairs (src < dst) — the shared graph
    fixture for the triangle / LPA / PageRank / clustering entries.

    SHARED EXTRACTION (round-10 verdict item 3): seven registry entries
    start from this same lineitem pass (at sf10 it is the heap-cliff
    stage, ~4 of the 5 most expensive bench entries), so the built edge
    set is memoized per (application, sf_dir) behind a lazy
    localCheckpoint — one extraction serves the whole graph family in a
    session, the way a 100 TB deployment would persist the edge extract
    once and fan analytics out from it.  The result is tiny
    (≤ 5·|suppliers| rows), so the checkpoint blocks are negligible.
    Correctness is unaffected: oracles recompute from lineitem, and the
    checkpointed rows ARE the single-build rows.  Set
    ``SPARK_GRAFT_GRAPH_COLD=1`` to rebuild per call — bench.py sets it
    so per-entry timings keep paying the full extraction (the committed
    bench contract measures per-entry cost, not fleet amortization).

    The edge contract is DENSITY-INVARIANT: each src keeps its 5
    strongest edges by (shared-part count desc, dst), so the extracted
    graph keeps its local structure as the corpus grows — a global
    top-N sparsifies per subgraph under growth (at sf≈1.0 the old
    top-500 spread over 10 replica graphs and the 2-core went empty,
    docs/ROUND8.md §4) and funnels through one global TakeOrdered; the
    per-group rank is one hash-partitioned window, no global ordering.

    Pair generation WITHOUT a self-join: per-part supplier lists are
    bounded (~26 suppliers/part at every SF), so sort_array + a nested
    transform explodes each part's ordered pairs locally — one shuffle
    on l_partkey instead of a join shuffle plus a probe.  The
    repartition matters: AQE coalesces the post-groupBy exchange by the
    SMALL list-table size, but the explode blows each row up ~325× —
    without re-spreading, millions of pair rows land on two tasks
    (explode-after-exchange defeats size-based coalescing).  The spread
    width is ``defaultParallelism`` (one slice per core), NOT a literal:
    a hard-coded 32 silently under-spreads the explode on any cluster
    wider than this box (round-10 verdict item 2)."""
    import os

    if os.environ.get("SPARK_GRAFT_GRAPH_COLD") == "1":
        return _build_cosupply_edges(spark, sf_dir)
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    df = _COSUPPLY_CACHE.get(key)
    if df is None:
        df = _build_cosupply_edges(spark, sf_dir).localCheckpoint(eager=False)
        _COSUPPLY_CACHE[key] = df
    return df


def _build_cosupply_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round-11 shuffle-count fix (guide §2.4): explode to (src, dst-list)
    # rows FIRST (a ~26× cheaper explode than the full pair explode), then
    # ONE hash repartition on src — the pair explode, the (src, dst)
    # count aggregate AND the per-src top-5 window all run inside that
    # partitioning (HashPartitioning(src) satisfies the clustering of
    # both downstream operators), so the plan carries 2 exchanges where
    # the round-10 shape carried 4 (partkey agg → round-robin spread →
    # pair-count agg → window) and the ~325×-per-part pair rows never
    # cross a shuffle at all.  The explicit partition count (one slice
    # per core, scale-adaptive) keeps AQE from coalescing the SMALL
    # src-list rows into few tasks before the explode blows them up —
    # the same explode-after-exchange trap the round-10 round-robin
    # spread existed to dodge.
    li = load_table(spark, sf_dir, "lineitem")
    lists = li.groupBy("l_partkey").agg(
        F.sort_array(F.collect_set("l_suppkey")).alias("ss")
    )
    # round-12 kernel A/B (same 2-exchange plan, bit-equal edges): emit
    # (i, src, ss) via posexplode and slice AFTER the shuffle, instead of
    # materializing every struct(src, slice(...)) array pre-shuffle — the
    # slice copies were ~40% of the extraction's warm time (1.86-2.22 s →
    # 1.21-1.45 s interleaved at sf0.1; the fully-materialized pair-struct
    # variant measured 2× SLOWER, 3.9-4.0 s).  The shuffle now carries the
    # full ss per src row (k² vs k²/2 longs per part) — both are O(k²)
    # metadata, a wash next to the lineitem scan at any SF.
    e1 = lists.select(F.posexplode("ss").alias("i", "src"), "ss")
    spread = e1.repartition(spark.sparkContext.defaultParallelism, "src")
    pairs = spread.select(
        "src", F.explode(F.expr("slice(ss, i + 2, size(ss))")).alias("dst")
    )
    w = Window.partitionBy("src").orderBy(F.desc("cnt"), "dst")
    return (
        pairs.groupBy("src", "dst")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("src", "dst")
    )


@register(
    "community_labels_cosupply",
    """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
pairs AS (SELECT a, b FROM (
            SELECT p1.l_suppkey AS a, p2.l_suppkey AS b,
                   row_number() OVER (PARTITION BY p1.l_suppkey
                                      ORDER BY COUNT(*) DESC, p2.l_suppkey) AS rn
            FROM ps p1 JOIN ps p2
              ON p1.l_partkey = p2.l_partkey AND p1.l_suppkey < p2.l_suppkey
            GROUP BY 1, 2)
          WHERE rn <= 5),
und AS MATERIALIZED (
  SELECT a, b FROM (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs)
  WHERE a <> b),
lbl0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM und),
votes1 AS (
  SELECT u.a AS node, l.label AS lbl FROM und u JOIN lbl0 l ON l.node = u.b
  UNION ALL
  SELECT node, label AS lbl FROM lbl0),
lbl1 AS MATERIALIZED (
  SELECT node, lbl AS label FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node ORDER BY COUNT(*) DESC, lbl) AS rn
    FROM votes1 GROUP BY node, lbl)
  WHERE rn = 1),
votes2 AS (
  SELECT u.a AS node, l.label AS lbl FROM und u JOIN lbl1 l ON l.node = u.b
  UNION ALL
  SELECT node, label AS lbl FROM lbl1),
lbl2 AS MATERIALIZED (
  SELECT node, lbl AS label FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node ORDER BY COUNT(*) DESC, lbl) AS rn
    FROM votes2 GROUP BY node, lbl)
  WHERE rn = 1),
votes3 AS (
  SELECT u.a AS node, l.label AS lbl FROM und u JOIN lbl2 l ON l.node = u.b
  UNION ALL
  SELECT node, label AS lbl FROM lbl2),
lbl3 AS MATERIALIZED (
  SELECT node, lbl AS label FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node ORDER BY COUNT(*) DESC, lbl) AS rn
    FROM votes3 GROUP BY node, lbl)
  WHERE rn = 1),
votes4 AS (
  SELECT u.a AS node, l.label AS lbl FROM und u JOIN lbl3 l ON l.node = u.b
  UNION ALL
  SELECT node, label AS lbl FROM lbl3),
lbl4 AS MATERIALIZED (
  SELECT node, lbl AS label FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node ORDER BY COUNT(*) DESC, lbl) AS rn
    FROM votes4 GROUP BY node, lbl)
  WHERE rn = 1),
votes5 AS (
  SELECT u.a AS node, l.label AS lbl FROM und u JOIN lbl4 l ON l.node = u.b
  UNION ALL
  SELECT node, label AS lbl FROM lbl4),
lbl5 AS MATERIALIZED (
  SELECT node, lbl AS label FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node ORDER BY COUNT(*) DESC, lbl) AS rn
    FROM votes5 GROUP BY node, lbl)
  WHERE rn = 1),
votes6 AS (
  SELECT u.a AS node, l.label AS lbl FROM und u JOIN lbl5 l ON l.node = u.b
  UNION ALL
  SELECT node, label AS lbl FROM lbl5),
lbl6 AS MATERIALIZED (
  SELECT node, lbl AS label FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node ORDER BY COUNT(*) DESC, lbl) AS rn
    FROM votes6 GROUP BY node, lbl)
  WHERE rn = 1),
votes7 AS (
  SELECT u.a AS node, l.label AS lbl FROM und u JOIN lbl6 l ON l.node = u.b
  UNION ALL
  SELECT node, label AS lbl FROM lbl6),
lbl7 AS MATERIALIZED (
  SELECT node, lbl AS label FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node ORDER BY COUNT(*) DESC, lbl) AS rn
    FROM votes7 GROUP BY node, lbl)
  WHERE rn = 1),
votes8 AS (
  SELECT u.a AS node, l.label AS lbl FROM und u JOIN lbl7 l ON l.node = u.b
  UNION ALL
  SELECT node, label AS lbl FROM lbl7),
lbl8 AS MATERIALIZED (
  SELECT node, lbl AS label FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node ORDER BY COUNT(*) DESC, lbl) AS rn
    FROM votes8 GROUP BY node, lbl)
  WHERE rn = 1),
votes9 AS (
  SELECT u.a AS node, l.label AS lbl FROM und u JOIN lbl8 l ON l.node = u.b
  UNION ALL
  SELECT node, label AS lbl FROM lbl8),
lbl9 AS MATERIALIZED (
  SELECT node, lbl AS label FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node ORDER BY COUNT(*) DESC, lbl) AS rn
    FROM votes9 GROUP BY node, lbl)
  WHERE rn = 1),
votes10 AS (
  SELECT u.a AS node, l.label AS lbl FROM und u JOIN lbl9 l ON l.node = u.b
  UNION ALL
  SELECT node, label AS lbl FROM lbl9),
lbl10 AS MATERIALIZED (
  SELECT node, lbl AS label FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node ORDER BY COUNT(*) DESC, lbl) AS rn
    FROM votes10 GROUP BY node, lbl)
  WHERE rn = 1)
SELECT label, COUNT(*) AS n_members FROM lbl10 GROUP BY label
""",
    doc="label-propagation communities over the per-src-top-5 co-supply pairs "
    "— ORACLE-GRADED (round 9): the 10 synchronous rounds are pure "
    "integer-count argmax with (count desc, label asc) ties, so the "
    "DuckDB twin unrolls them as chained CTEs (neighbor votes + "
    "self-vote -> count -> argmax per round); an early Spark-side "
    "convergence break is a fixpoint, so extra unrolled rounds are "
    "no-ops — identical labels either way; output is the per-community "
    "size table",
)
def community_labels_cosupply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import label_propagation

    labels = label_propagation(_cosupply_edges(spark, sf_dir))
    return labels.groupBy("label").agg(F.count("*").alias("n_members"))


@register(
    "pagerank_cosupply",
    """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
pairs AS (SELECT a, b FROM (
            SELECT p1.l_suppkey AS a, p2.l_suppkey AS b,
                   row_number() OVER (PARTITION BY p1.l_suppkey
                                      ORDER BY COUNT(*) DESC, p2.l_suppkey) AS rn
            FROM ps p1 JOIN ps p2
              ON p1.l_partkey = p2.l_partkey AND p1.l_suppkey < p2.l_suppkey
            GROUP BY 1, 2)
          WHERE rn <= 5),
ed AS MATERIALIZED (SELECT a AS node, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
nodes AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT node FROM ed UNION ALL SELECT dst AS node FROM ed)),
nn AS (SELECT COUNT(*) AS n FROM nodes),
deg AS MATERIALIZED (SELECT node, COUNT(*) AS d FROM ed GROUP BY node),
r0 AS MATERIALIZED (
  SELECT node, CAST(floor(1e15 / nn.n + 0.5) AS BIGINT) AS units FROM nodes, nn),
dang1 AS (SELECT COALESCE(SUM(r.units), 0) AS du
         FROM r0 r LEFT JOIN deg d ON d.node = r.node WHERE d.node IS NULL),
inb1 AS (SELECT e.dst AS node, SUM(CAST(round(CAST(r.units AS DOUBLE) / d.d) AS BIGINT)) AS iu
        FROM r0 r JOIN deg d ON d.node = r.node JOIN ed e ON e.node = r.node
        GROUP BY e.dst),
r1 AS MATERIALIZED (
  SELECT nodes.node,
         CAST(round(((1.0 - 0.85) / nn.n + 0.85 * (dang1.du * 1e-15) / nn.n) * 1e15
                    + 0.85 * CAST(COALESCE(inb1.iu, 0) AS DOUBLE)) AS BIGINT) AS units
  FROM nodes CROSS JOIN nn CROSS JOIN dang1
  LEFT JOIN inb1 ON inb1.node = nodes.node),
dang2 AS (SELECT COALESCE(SUM(r.units), 0) AS du
         FROM r1 r LEFT JOIN deg d ON d.node = r.node WHERE d.node IS NULL),
inb2 AS (SELECT e.dst AS node, SUM(CAST(round(CAST(r.units AS DOUBLE) / d.d) AS BIGINT)) AS iu
        FROM r1 r JOIN deg d ON d.node = r.node JOIN ed e ON e.node = r.node
        GROUP BY e.dst),
r2 AS MATERIALIZED (
  SELECT nodes.node,
         CAST(round(((1.0 - 0.85) / nn.n + 0.85 * (dang2.du * 1e-15) / nn.n) * 1e15
                    + 0.85 * CAST(COALESCE(inb2.iu, 0) AS DOUBLE)) AS BIGINT) AS units
  FROM nodes CROSS JOIN nn CROSS JOIN dang2
  LEFT JOIN inb2 ON inb2.node = nodes.node),
dang3 AS (SELECT COALESCE(SUM(r.units), 0) AS du
         FROM r2 r LEFT JOIN deg d ON d.node = r.node WHERE d.node IS NULL),
inb3 AS (SELECT e.dst AS node, SUM(CAST(round(CAST(r.units AS DOUBLE) / d.d) AS BIGINT)) AS iu
        FROM r2 r JOIN deg d ON d.node = r.node JOIN ed e ON e.node = r.node
        GROUP BY e.dst),
r3 AS MATERIALIZED (
  SELECT nodes.node,
         CAST(round(((1.0 - 0.85) / nn.n + 0.85 * (dang3.du * 1e-15) / nn.n) * 1e15
                    + 0.85 * CAST(COALESCE(inb3.iu, 0) AS DOUBLE)) AS BIGINT) AS units
  FROM nodes CROSS JOIN nn CROSS JOIN dang3
  LEFT JOIN inb3 ON inb3.node = nodes.node),
dang4 AS (SELECT COALESCE(SUM(r.units), 0) AS du
         FROM r3 r LEFT JOIN deg d ON d.node = r.node WHERE d.node IS NULL),
inb4 AS (SELECT e.dst AS node, SUM(CAST(round(CAST(r.units AS DOUBLE) / d.d) AS BIGINT)) AS iu
        FROM r3 r JOIN deg d ON d.node = r.node JOIN ed e ON e.node = r.node
        GROUP BY e.dst),
r4 AS MATERIALIZED (
  SELECT nodes.node,
         CAST(round(((1.0 - 0.85) / nn.n + 0.85 * (dang4.du * 1e-15) / nn.n) * 1e15
                    + 0.85 * CAST(COALESCE(inb4.iu, 0) AS DOUBLE)) AS BIGINT) AS units
  FROM nodes CROSS JOIN nn CROSS JOIN dang4
  LEFT JOIN inb4 ON inb4.node = nodes.node),
dang5 AS (SELECT COALESCE(SUM(r.units), 0) AS du
         FROM r4 r LEFT JOIN deg d ON d.node = r.node WHERE d.node IS NULL),
inb5 AS (SELECT e.dst AS node, SUM(CAST(round(CAST(r.units AS DOUBLE) / d.d) AS BIGINT)) AS iu
        FROM r4 r JOIN deg d ON d.node = r.node JOIN ed e ON e.node = r.node
        GROUP BY e.dst),
r5 AS MATERIALIZED (
  SELECT nodes.node,
         CAST(round(((1.0 - 0.85) / nn.n + 0.85 * (dang5.du * 1e-15) / nn.n) * 1e15
                    + 0.85 * CAST(COALESCE(inb5.iu, 0) AS DOUBLE)) AS BIGINT) AS units
  FROM nodes CROSS JOIN nn CROSS JOIN dang5
  LEFT JOIN inb5 ON inb5.node = nodes.node),
dang6 AS (SELECT COALESCE(SUM(r.units), 0) AS du
         FROM r5 r LEFT JOIN deg d ON d.node = r.node WHERE d.node IS NULL),
inb6 AS (SELECT e.dst AS node, SUM(CAST(round(CAST(r.units AS DOUBLE) / d.d) AS BIGINT)) AS iu
        FROM r5 r JOIN deg d ON d.node = r.node JOIN ed e ON e.node = r.node
        GROUP BY e.dst),
r6 AS MATERIALIZED (
  SELECT nodes.node,
         CAST(round(((1.0 - 0.85) / nn.n + 0.85 * (dang6.du * 1e-15) / nn.n) * 1e15
                    + 0.85 * CAST(COALESCE(inb6.iu, 0) AS DOUBLE)) AS BIGINT) AS units
  FROM nodes CROSS JOIN nn CROSS JOIN dang6
  LEFT JOIN inb6 ON inb6.node = nodes.node),
dang7 AS (SELECT COALESCE(SUM(r.units), 0) AS du
         FROM r6 r LEFT JOIN deg d ON d.node = r.node WHERE d.node IS NULL),
inb7 AS (SELECT e.dst AS node, SUM(CAST(round(CAST(r.units AS DOUBLE) / d.d) AS BIGINT)) AS iu
        FROM r6 r JOIN deg d ON d.node = r.node JOIN ed e ON e.node = r.node
        GROUP BY e.dst),
r7 AS MATERIALIZED (
  SELECT nodes.node,
         CAST(round(((1.0 - 0.85) / nn.n + 0.85 * (dang7.du * 1e-15) / nn.n) * 1e15
                    + 0.85 * CAST(COALESCE(inb7.iu, 0) AS DOUBLE)) AS BIGINT) AS units
  FROM nodes CROSS JOIN nn CROSS JOIN dang7
  LEFT JOIN inb7 ON inb7.node = nodes.node),
dang8 AS (SELECT COALESCE(SUM(r.units), 0) AS du
         FROM r7 r LEFT JOIN deg d ON d.node = r.node WHERE d.node IS NULL),
inb8 AS (SELECT e.dst AS node, SUM(CAST(round(CAST(r.units AS DOUBLE) / d.d) AS BIGINT)) AS iu
        FROM r7 r JOIN deg d ON d.node = r.node JOIN ed e ON e.node = r.node
        GROUP BY e.dst),
r8 AS MATERIALIZED (
  SELECT nodes.node,
         CAST(round(((1.0 - 0.85) / nn.n + 0.85 * (dang8.du * 1e-15) / nn.n) * 1e15
                    + 0.85 * CAST(COALESCE(inb8.iu, 0) AS DOUBLE)) AS BIGINT) AS units
  FROM nodes CROSS JOIN nn CROSS JOIN dang8
  LEFT JOIN inb8 ON inb8.node = nodes.node),
dang9 AS (SELECT COALESCE(SUM(r.units), 0) AS du
         FROM r8 r LEFT JOIN deg d ON d.node = r.node WHERE d.node IS NULL),
inb9 AS (SELECT e.dst AS node, SUM(CAST(round(CAST(r.units AS DOUBLE) / d.d) AS BIGINT)) AS iu
        FROM r8 r JOIN deg d ON d.node = r.node JOIN ed e ON e.node = r.node
        GROUP BY e.dst),
r9 AS MATERIALIZED (
  SELECT nodes.node,
         CAST(round(((1.0 - 0.85) / nn.n + 0.85 * (dang9.du * 1e-15) / nn.n) * 1e15
                    + 0.85 * CAST(COALESCE(inb9.iu, 0) AS DOUBLE)) AS BIGINT) AS units
  FROM nodes CROSS JOIN nn CROSS JOIN dang9
  LEFT JOIN inb9 ON inb9.node = nodes.node),
dang10 AS (SELECT COALESCE(SUM(r.units), 0) AS du
         FROM r9 r LEFT JOIN deg d ON d.node = r.node WHERE d.node IS NULL),
inb10 AS (SELECT e.dst AS node, SUM(CAST(round(CAST(r.units AS DOUBLE) / d.d) AS BIGINT)) AS iu
        FROM r9 r JOIN deg d ON d.node = r.node JOIN ed e ON e.node = r.node
        GROUP BY e.dst),
r10 AS MATERIALIZED (
  SELECT nodes.node,
         CAST(round(((1.0 - 0.85) / nn.n + 0.85 * (dang10.du * 1e-15) / nn.n) * 1e15
                    + 0.85 * CAST(COALESCE(inb10.iu, 0) AS DOUBLE)) AS BIGINT) AS units
  FROM nodes CROSS JOIN nn CROSS JOIN dang10
  LEFT JOIN inb10 ON inb10.node = nodes.node),
d1 AS (SELECT 1 AS j, SUM(ABS(a.units - b.units)) AS dl FROM r1 a JOIN r0 b ON a.node = b.node), d2 AS (SELECT 2 AS j, SUM(ABS(a.units - b.units)) AS dl FROM r2 a JOIN r1 b ON a.node = b.node), d3 AS (SELECT 3 AS j, SUM(ABS(a.units - b.units)) AS dl FROM r3 a JOIN r2 b ON a.node = b.node), d4 AS (SELECT 4 AS j, SUM(ABS(a.units - b.units)) AS dl FROM r4 a JOIN r3 b ON a.node = b.node), d5 AS (SELECT 5 AS j, SUM(ABS(a.units - b.units)) AS dl FROM r5 a JOIN r4 b ON a.node = b.node), d6 AS (SELECT 6 AS j, SUM(ABS(a.units - b.units)) AS dl FROM r6 a JOIN r5 b ON a.node = b.node), d7 AS (SELECT 7 AS j, SUM(ABS(a.units - b.units)) AS dl FROM r7 a JOIN r6 b ON a.node = b.node), d8 AS (SELECT 8 AS j, SUM(ABS(a.units - b.units)) AS dl FROM r8 a JOIN r7 b ON a.node = b.node), d9 AS (SELECT 9 AS j, SUM(ABS(a.units - b.units)) AS dl FROM r9 a JOIN r8 b ON a.node = b.node),
stopk AS (SELECT COALESCE(MIN(j), 10) AS k
          FROM (SELECT j, dl FROM d1 UNION ALL SELECT j, dl FROM d2 UNION ALL SELECT j, dl FROM d3 UNION ALL SELECT j, dl FROM d4 UNION ALL SELECT j, dl FROM d5 UNION ALL SELECT j, dl FROM d6 UNION ALL SELECT j, dl FROM d7 UNION ALL SELECT j, dl FROM d8 UNION ALL SELECT j, dl FROM d9) WHERE dl < 100000000.0),
allr AS (SELECT 1 AS k, node, units FROM r1 UNION ALL SELECT 2 AS k, node, units FROM r2 UNION ALL SELECT 3 AS k, node, units FROM r3 UNION ALL SELECT 4 AS k, node, units FROM r4 UNION ALL SELECT 5 AS k, node, units FROM r5 UNION ALL SELECT 6 AS k, node, units FROM r6 UNION ALL SELECT 7 AS k, node, units FROM r7 UNION ALL SELECT 8 AS k, node, units FROM r8 UNION ALL SELECT 9 AS k, node, units FROM r9 UNION ALL SELECT 10 AS k, node, units FROM r10),
fin AS (SELECT node, CAST(units AS DOUBLE) * 1e-15 AS rank
        FROM allr JOIN stopk ON allr.k = stopk.k)
SELECT node, CAST(round(rank * 1e9) AS BIGINT) AS rank_e9
FROM fin ORDER BY rank DESC, node LIMIT 20
""",
    doc="PageRank over the per-src-top-5 co-supply pairs — ORACLE-GRADED "
    "(round 9): ranks carried as exact BIGINT 1e-15 units make every "
    "cross-row sum order-independent, so the power iteration (incl. the "
    "early-stop rule: return r_K at the first K with L1 delta < tol) "
    "unrolls into a DuckDB twin replaying the identical IEEE expression "
    "sequence per round; output is the top-20 suppliers by rank",
)
def pagerank_cosupply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank

    top = _cosupply_edges(spark, sf_dir)
    # undirected co-supply graph → symmetrize so rank flows both ways
    edges = top.union(top.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank(edges, n_iters=10, tol=1e-7)
    return (
        ranks.orderBy(F.desc("rank"), "node")
        .limit(20)
        .select("node", F.round(F.col("rank") * 1e9).cast("long").alias("rank_e9"))
    )


# ---------------------------------------------------------------------------
# Data-quality expectation suite (operators/expectations.py): the
# Deequ-style declarative data contract over orders — completeness,
# key distinctness, set/range/regex compliance, row count, mean bounds —
# ALL evaluated in one aggregate pass (single scan, map-side partials,
# 1-row intermediate exploded to the report).  Ratio metrics are exact
# BIGINT-count ratios (one double division, engine-portable); the mean
# uses the repo-wide DECIMAL(18,4) sum convention.
# ---------------------------------------------------------------------------
@register(
    "dq_expectations_orders",
    """
WITH a AS (
  SELECT COUNT(*) AS n_rows,
         COUNT(o_custkey) AS ck_nn,
         COUNT(DISTINCT o_orderkey) AS ok_dc,
         COUNT(o_orderkey) AS ok_nn,
         COUNT(o_orderstatus) AS st_nn,
         COUNT(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 END) AS st_ok,
         COUNT(o_totalprice) AS tp_nn,
         COUNT(CASE WHEN o_totalprice BETWEEN 0 AND 500000 THEN 1 END) AS tp_ok,
         COUNT(o_orderpriority) AS pr_nn,
         COUNT(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')
               THEN 1 END) AS pr_ok,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS tp_sum
  FROM orders),
r AS (
  SELECT 'row_count' AS chk, CAST(n_rows AS DOUBLE) AS value,
         CAST(1 AS DOUBLE) AS lo, CAST(NULL AS DOUBLE) AS hi FROM a
  UNION ALL
  SELECT 'completeness(o_custkey)',
         CAST(ck_nn AS DOUBLE) / NULLIF(CAST(n_rows AS DOUBLE), 0),
         1.0, NULL FROM a
  UNION ALL
  SELECT 'distinctness(o_orderkey)',
         CAST(ok_dc AS DOUBLE) / NULLIF(CAST(ok_nn AS DOUBLE), 0),
         1.0, NULL FROM a
  UNION ALL
  SELECT 'in_set(o_orderstatus)',
         CAST(st_ok AS DOUBLE) / NULLIF(CAST(st_nn AS DOUBLE), 0),
         1.0, NULL FROM a
  UNION ALL
  SELECT 'in_range(o_totalprice)',
         CAST(tp_ok AS DOUBLE) / NULLIF(CAST(tp_nn AS DOUBLE), 0),
         0.99, NULL FROM a
  UNION ALL
  SELECT 'matches(o_orderpriority)',
         CAST(pr_ok AS DOUBLE) / NULLIF(CAST(pr_nn AS DOUBLE), 0),
         1.0, NULL FROM a
  UNION ALL
  SELECT 'mean_between(o_totalprice)',
         tp_sum / NULLIF(CAST(tp_nn AS DOUBLE), 0),
         100000.0, 400000.0 FROM a)
SELECT chk AS "check", value, lo, hi,
       CASE WHEN value IS NULL THEN false
            ELSE (lo IS NULL OR value >= lo) AND (hi IS NULL OR value <= hi)
       END AS passed
FROM r
""",
    doc="declarative data-quality expectation suite over orders "
    "(completeness / key distinctness / set-range-regex compliance / "
    "row count / mean bounds) — ONE aggregate pass, per-check report "
    "rows with measured metric + bounds + verdict",
)
def dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import expectations as X

    o = load_table(spark, sf_dir, "orders")
    suite = [
        X.row_count(lo=1),
        X.completeness("o_custkey", 1.0),
        X.distinctness("o_orderkey", 1.0),
        X.in_set("o_orderstatus", ["O", "F", "P"], 1.0),
        X.in_range("o_totalprice", 0, 500000, 0.99),
        X.matches("o_orderpriority", "^[1-5]-[A-Z ]+$", 1.0),
        X.mean_between("o_totalprice", 100000.0, 400000.0),
    ]
    return X.run_suite(o, suite)


# ---------------------------------------------------------------------------
# Robust per-group outlier detection (operators/profile.py mad_outliers):
# median/MAD flags, exact-integer quantization so both engines
# interpolate identical medians (halves/quarters — exactly representable
# doubles; see the operator docstring).  One shuffle: both medians are
# window aggregates over the same partitionBy exchange.
# ---------------------------------------------------------------------------
@register(
    "outliers_mad_lineitem",
    """
WITH q AS (
  SELECT l_returnflag AS g,
         CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS xq
  FROM lineitem),
m AS (
  SELECT g, xq, quantile_cont(xq, 0.5) OVER (PARTITION BY g) AS med FROM q),
d AS (
  SELECT g, med, abs(CAST(xq AS DOUBLE) - med) AS dev FROM m),
dd AS (
  SELECT g, med, dev, quantile_cont(dev, 0.5) OVER (PARTITION BY g) AS mad
  FROM d)
SELECT g AS l_returnflag, COUNT(*) AS n,
       MIN(med) AS med, MIN(mad) AS mad,
       COUNT(CASE WHEN dev > 3 * mad THEN 1 END) AS n_out
FROM dd GROUP BY g
""",
    doc="median/MAD robust outlier flags per return flag (50% breakdown "
    "point vs mean/stddev self-masking) — exact-integer quantization, one "
    "shuffle, per-group counts of flagged rows",
)
def outliers_mad_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import mad_outliers

    li = load_table(spark, sf_dir, "lineitem")
    flagged = mad_outliers(li, "l_returnflag", "l_extendedprice", k=3)
    return flagged.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.min("med").alias("med"),
        F.min("mad").alias("mad"),
        F.count(F.when(F.col("is_outlier"), 1)).alias("n_out"),
    )


@register(
    "kcore_cosupply",
    """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
pairs AS (SELECT a, b FROM (
            SELECT p1.l_suppkey AS a, p2.l_suppkey AS b,
                   row_number() OVER (PARTITION BY p1.l_suppkey
                                      ORDER BY COUNT(*) DESC, p2.l_suppkey) AS rn
            FROM ps p1 JOIN ps p2
              ON p1.l_partkey = p2.l_partkey AND p1.l_suppkey < p2.l_suppkey
            GROUP BY 1, 2)
          WHERE rn <= 5),
surv0 AS MATERIALIZED (SELECT a, b FROM pairs),
deg1 AS (SELECT v, COUNT(*) AS d
        FROM (SELECT a AS v FROM surv0 UNION ALL SELECT b AS v FROM surv0) x
        GROUP BY v),
keep1 AS (SELECT v FROM deg1 WHERE d >= 2),
surv1 AS MATERIALIZED (SELECT s.a, s.b FROM surv0 s
          JOIN keep1 ka ON ka.v = s.a JOIN keep1 kb ON kb.v = s.b),
deg2 AS (SELECT v, COUNT(*) AS d
        FROM (SELECT a AS v FROM surv1 UNION ALL SELECT b AS v FROM surv1) x
        GROUP BY v),
keep2 AS (SELECT v FROM deg2 WHERE d >= 2),
surv2 AS MATERIALIZED (SELECT s.a, s.b FROM surv1 s
          JOIN keep2 ka ON ka.v = s.a JOIN keep2 kb ON kb.v = s.b),
deg3 AS (SELECT v, COUNT(*) AS d
        FROM (SELECT a AS v FROM surv2 UNION ALL SELECT b AS v FROM surv2) x
        GROUP BY v),
keep3 AS (SELECT v FROM deg3 WHERE d >= 2),
surv3 AS MATERIALIZED (SELECT s.a, s.b FROM surv2 s
          JOIN keep3 ka ON ka.v = s.a JOIN keep3 kb ON kb.v = s.b),
deg4 AS (SELECT v, COUNT(*) AS d
        FROM (SELECT a AS v FROM surv3 UNION ALL SELECT b AS v FROM surv3) x
        GROUP BY v),
keep4 AS (SELECT v FROM deg4 WHERE d >= 2),
surv4 AS MATERIALIZED (SELECT s.a, s.b FROM surv3 s
          JOIN keep4 ka ON ka.v = s.a JOIN keep4 kb ON kb.v = s.b),
deg5 AS (SELECT v, COUNT(*) AS d
        FROM (SELECT a AS v FROM surv4 UNION ALL SELECT b AS v FROM surv4) x
        GROUP BY v),
keep5 AS (SELECT v FROM deg5 WHERE d >= 2),
surv5 AS MATERIALIZED (SELECT s.a, s.b FROM surv4 s
          JOIN keep5 ka ON ka.v = s.a JOIN keep5 kb ON kb.v = s.b),
deg6 AS (SELECT v, COUNT(*) AS d
        FROM (SELECT a AS v FROM surv5 UNION ALL SELECT b AS v FROM surv5) x
        GROUP BY v),
keep6 AS (SELECT v FROM deg6 WHERE d >= 2),
surv6 AS MATERIALIZED (SELECT s.a, s.b FROM surv5 s
          JOIN keep6 ka ON ka.v = s.a JOIN keep6 kb ON kb.v = s.b),
deg7 AS (SELECT v, COUNT(*) AS d
        FROM (SELECT a AS v FROM surv6 UNION ALL SELECT b AS v FROM surv6) x
        GROUP BY v),
keep7 AS (SELECT v FROM deg7 WHERE d >= 2),
surv7 AS MATERIALIZED (SELECT s.a, s.b FROM surv6 s
          JOIN keep7 ka ON ka.v = s.a JOIN keep7 kb ON kb.v = s.b),
deg8 AS (SELECT v, COUNT(*) AS d
        FROM (SELECT a AS v FROM surv7 UNION ALL SELECT b AS v FROM surv7) x
        GROUP BY v),
keep8 AS (SELECT v FROM deg8 WHERE d >= 2),
surv8 AS MATERIALIZED (SELECT s.a, s.b FROM surv7 s
          JOIN keep8 ka ON ka.v = s.a JOIN keep8 kb ON kb.v = s.b),
fin AS (SELECT v, COUNT(*) AS d
        FROM (SELECT a AS v FROM surv8 UNION ALL SELECT b AS v FROM surv8) x
        GROUP BY v)
SELECT v AS node, CAST(d AS BIGINT) AS degree FROM fin WHERE d >= 2
""",
    doc="2-core of the per-src-top-5 co-supply graph — ORACLE-GRADED "
    "(round 9): the peel loop is unrolled as 8 chained CTEs in DuckDB "
    "(degree -> keep -> surviving edges per round; the fixture graph "
    "converges in ONE round at every SF, so 8 is a wide margin — an "
    "insufficient unroll would HASH-FAIL, never silently pass); output "
    "is the surviving (node, in-core degree) table; the per-src edge "
    "rank keeps the 2-core non-empty at every SF",
)
def kcore_cosupply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import kcore

    return kcore(_cosupply_edges(spark, sf_dir), k=2)


# ---------------------------------------------------------------------------
# BFS hop distances (operators/graph.py bfs_hops): unweighted shortest
# hops from the graph's max-degree hub over the per-src-top-5 co-supply graph.
# The first ORACLE-GRADED iterative-loop graph entry: DuckDB's bounded
# recursive CTE (UNION-dedup on (node, hops), MIN per node) replays the
# frontier expansion exactly, so the loop's every hop number hash-matches.
# ---------------------------------------------------------------------------
@register(
    "bfs_hops_cosupply",
    """
WITH RECURSIVE ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
pairs AS (SELECT a, b FROM (
            SELECT p1.l_suppkey AS a, p2.l_suppkey AS b,
                   row_number() OVER (PARTITION BY p1.l_suppkey
                                      ORDER BY COUNT(*) DESC, p2.l_suppkey) AS rn
            FROM ps p1 JOIN ps p2
              ON p1.l_partkey = p2.l_partkey AND p1.l_suppkey < p2.l_suppkey
            GROUP BY 1, 2)
          WHERE rn <= 5),
deg AS (SELECT v, COUNT(*) AS d
        FROM (SELECT a AS v FROM pairs UNION ALL SELECT b AS v FROM pairs) x
        GROUP BY v),
srcn AS (SELECT v FROM deg ORDER BY d DESC, v LIMIT 1),
walk(node, hops) AS (
  SELECT v AS node, 0 AS hops FROM srcn
  UNION
  SELECT CASE WHEN w.node = p.a THEN p.b ELSE p.a END AS node, w.hops + 1 AS hops
  FROM walk w JOIN pairs p ON w.node = p.a OR w.node = p.b
  WHERE w.hops < 6
)
SELECT node, CAST(MIN(hops) AS BIGINT) AS hops FROM walk GROUP BY node
""",
    doc="BFS hop distances from the max-degree hub (tie: lowest id) over "
    "the per-src-top-5 co-supply graph, ≤6 hops: one frontier×edges join + "
    "anti-join vs visited per round, lineage cut, one action per round; "
    "oracle = bounded recursive CTE with MIN(hops)",
)
def bfs_hops_cosupply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import _canon_edges, _degrees, bfs_hops

    # canon is checkpointed: the seed ranking AND the BFS loop read the
    # SAME materialization (passing the raw extract ran the 18M-row
    # groupBy + window twice — 2x the extract cost at sf3)
    canon = _canon_edges(_cosupply_edges(spark, sf_dir), "src", "dst")
    seed = _degrees(canon).orderBy(F.desc("d"), "v").limit(1).select("v")
    return bfs_hops(canon, seed, max_hops=6, src="a", dst="b")


# ---------------------------------------------------------------------------
# Benford first-digit conformance test on l_extendedprice — the
# forensic-accounting screen for fabricated numeric columns (a synthetic
# or tampered amount column diverges from Benford's log-curve).  The
# nine expected probabilities are EMBEDDED AS LITERALS (computed once,
# full double precision) so neither engine evaluates log10 at runtime —
# no libm divergence.  First digits come from exact integer cents via
# string heads (no float log10 boundary risk); chi-square terms quantize
# to 1e-9 units before the 9-term sum.  Scale: one scan collapsing to 9
# rows at a map-side-combined aggregate.
# ---------------------------------------------------------------------------
_BENFORD_DUCK_VALUES = "(1, 0.3010299956639812), (2, 0.17609125905568124), (3, 0.12493873660829992), (4, 0.09691001300805642), (5, 0.07918124604762482), (6, 0.06694678963061322), (7, 0.05799194697768673), (8, 0.05115252244738129), (9, 0.04575749056067514)"


@register(
    "benford_price_digits",
    f"""
WITH cents AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem
  WHERE l_extendedprice > 0
),
digits AS (
  -- c >= 1: amounts in (0, 0.005) round to 0 cents, whose digit '0'
  -- would inflate n_tot while the 1-9 grid drops its row
  SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit FROM cents WHERE c >= 1
),
obs AS (SELECT digit, COUNT(*) AS n_obs FROM digits GROUP BY digit),
n AS (SELECT COUNT(*) AS n_tot FROM digits),
exp_p(digit, p) AS (VALUES {_BENFORD_DUCK_VALUES}),
grid AS (
  SELECT e.digit, COALESCE(o.n_obs, 0) AS n_obs, CAST(e.p AS DOUBLE) AS p, n.n_tot
  FROM exp_p e LEFT JOIN obs o ON o.digit = e.digit CROSS JOIN n
),
terms AS (
  SELECT digit, n_obs, p, n_tot,
         CAST(round((n_obs - n_tot * p) * (n_obs - n_tot * p) / (n_tot * p) * 1e9) AS BIGINT) AS t_e9
  FROM grid
),
chi AS (SELECT CAST(SUM(t_e9) AS DOUBLE) / 1e9 AS chi2 FROM terms)
SELECT digit, n_obs,
       round(CAST(n_obs AS DOUBLE) / n_tot, 9) AS obs_p,
       round(p, 9) AS expected_p,
       round(chi2, 9) AS chi2
FROM terms CROSS JOIN chi
""",
    doc="Benford first-digit test on price cents: literal expected "
    "probabilities (no runtime log10), integer-string first digits, "
    "e9-quantized chi-square — 9-row forensic screen from one scan",
)
def benford_price_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return benford_digits(li, "l_extendedprice")


def benford_digits(df: DataFrame, amount_col: str) -> DataFrame:
    """(digit, n_obs, obs_p, expected_p, chi2): Benford first-digit
    conformance for a positive amount column; digits from exact integer
    cents, expected probabilities as embedded literals, chi-square from
    e9-quantized terms (all 9 digits present via grid fill)."""
    spark = df.sparkSession
    cents = df.where(F.col(amount_col) > 0).select(
        F.round(F.col(amount_col) * 100).cast("long").alias("c")
    )
    # c >= 1: amounts in (0, 0.005) round to 0 cents — their digit '0'
    # has no grid row, so counting them in n_tot would skew obs_p/chi2
    digits = (
        cents.where(F.col("c") >= 1)
        .select(F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit"))
    )
    obs = digits.groupBy("digit").agg(F.count("*").alias("n_obs"))
    n = digits.agg(F.count("*").alias("n_tot"))
    exp_p = spark.createDataFrame([(1, 0.3010299956639812), (2, 0.17609125905568124), (3, 0.12493873660829992), (4, 0.09691001300805642), (5, 0.07918124604762482), (6, 0.06694678963061322), (7, 0.05799194697768673), (8, 0.05115252244738129), (9, 0.04575749056067514)], "digit int, p double")
    grid = (
        exp_p.join(obs, "digit", "left")
        .crossJoin(F.broadcast(n))
        .select("digit", F.coalesce("n_obs", F.lit(0)).alias("n_obs"), "p", "n_tot")
    )
    t_e9 = F.round(
        (F.col("n_obs") - F.col("n_tot") * F.col("p"))
        * (F.col("n_obs") - F.col("n_tot") * F.col("p"))
        / (F.col("n_tot") * F.col("p"))
        * 1e9
    ).cast("long")
    terms = grid.withColumn("t_e9", t_e9)
    chi = terms.agg((F.sum("t_e9").cast("double") / 1e9).alias("chi2"))
    return terms.crossJoin(F.broadcast(chi)).select(
        "digit",
        "n_obs",
        F.round(F.col("n_obs").cast("double") / F.col("n_tot"), 9).alias("obs_p"),
        F.round("p", 9).alias("expected_p"),
        F.round("chi2", 9).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# Connected components (operators/dedup.dup_clusters) over the co-supply
# graph — ORACLE-GRADED (round 9): the pointer-jumping min-label loop is
# the decision step of EVERY near-dup tier (minhash / simhash / embedding
# / semantic all call dup_clusters), so grading it against DuckDB's
# recursive label-closure retires the largest remaining trust-the-pins
# primitive.  Contract: component id = MIN node id in the component.
# ---------------------------------------------------------------------------
@register(
    "connected_components_cosupply",
    """
WITH RECURSIVE ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
pairs AS (SELECT a, b FROM (
            SELECT p1.l_suppkey AS a, p2.l_suppkey AS b,
                   row_number() OVER (PARTITION BY p1.l_suppkey
                                      ORDER BY COUNT(*) DESC, p2.l_suppkey) AS rn
            FROM ps p1 JOIN ps p2
              ON p1.l_partkey = p2.l_partkey AND p1.l_suppkey < p2.l_suppkey
            GROUP BY 1, 2)
          WHERE rn <= 5),
und AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
walk(node, lbl) AS (
  SELECT a AS node, a AS lbl FROM und
  UNION
  SELECT u.b AS node, w.lbl FROM walk w JOIN und u ON u.a = w.node
)
SELECT node, CAST(MIN(lbl) AS BIGINT) AS component FROM walk GROUP BY node
""",
    doc="connected components over the per-src-top-5 co-supply graph: "
    "pointer-jumped min-label propagation (O(log diameter) rounds, one "
    "action per round) == DuckDB's recursive label closure; component "
    "id = min member id — the keeper-selection contract every dedup "
    "tier inherits",
)
def connected_components_cosupply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import dup_clusters

    comps = dup_clusters(_cosupply_edges(spark, sf_dir), "src", "dst")
    return comps.select(
        F.col(comps.columns[0]).alias("node"),
        F.col(comps.columns[1]).cast("long").alias("component"),
    )
