"""TPC-H completion (queries/tpch.py): preconditions and plan shapes.

Value correctness is driver-checked (every entry is oracle-bearing and
hash-compared against DuckDB); these tests pin the two things the oracle
cannot see — the EXACT-arithmetic precondition and the physical shape of
the decorrelations."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_event_tracker_spark.queries import REGISTRY
from eth_event_tracker_spark.tables import load_table

from .test_plans import plan_of


def test_quantity_integrality_precondition(spark, sf_dir):
    """q17/q20 compare thresholds in exact BIGINT arithmetic, which is
    lossless only because TPC-H quantities are integral (Spark truncates
    double→bigint, DuckDB rounds — they'd disagree on 4.5)."""
    li = load_table(spark, sf_dir, "lineitem")
    n_frac = li.where(F.col("l_quantity") != F.floor("l_quantity")).count()
    assert n_frac == 0, "lineitem quantities must be integral for the BIGINT threshold"


def test_tpch_decorrelation_plan_shapes(spark, sf_dir):
    """The decorrelated forms must plan as the join types they claim."""
    # Q4: EXISTS → one semi join, no cartesian anything
    p4 = plan_of(REGISTRY["q4_order_priority"].fn(spark, sf_dir))
    assert "LeftSemi" in p4 and "CartesianProduct" not in p4

    # Q16: NOT IN → anti join against the broadcast bad-supplier set
    p16 = plan_of(REGISTRY["q16_parts_supplier_relation"].fn(spark, sf_dir))
    assert "LeftAnti" in p16

    # Q21: both correlated subqueries fold into ONE groupBy(l_orderkey)
    # over lineitem — the fact table is scanned (and shuffled) exactly
    # once (round-6 advice #2); the orders-status EXISTS stays a semi
    p21 = plan_of(REGISTRY["q21_suppliers_waiting"].fn(spark, sf_dir))
    assert p21.count("lineitem.parquet") == 1, "lineitem must be scanned once"
    assert "LeftSemi" in p21
    assert "CartesianProduct" not in p21 and "BroadcastNestedLoopJoin" not in p21

    # Q6: all three filters reach the parquet scan
    p6 = plan_of(REGISTRY["q6_forecast_revenue"].fn(spark, sf_dir))
    assert "PushedFilters" in p6 and "l_shipdate" in p6.split("PushedFilters", 1)[1][:400]

    # Q2/Q17: the correlated-subquery decorrelations keep every join
    # equi-keyed; the dim/EU/min sides ride broadcasts
    for name in ("q2_min_cost_supplier", "q17_small_qty_revenue"):
        p = plan_of(REGISTRY[name].fn(spark, sf_dir))
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
        assert "BroadcastHashJoin" in p


def test_q13_left_outer_keeps_zero_order_customers(spark, sf_dir):
    """The ON-clause filter (vs WHERE) distinction: customers whose only
    orders are 5-LOW must appear in the c_count=0 bucket, so the
    distribution's total equals the customer count."""
    res = {
        r.c_count: r.custdist
        for r in REGISTRY["q13_customer_distribution"].fn(spark, sf_dir).collect()
    }
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(res.values()) == n_cust, "every customer appears exactly once"
