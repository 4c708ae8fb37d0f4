"""Run the complete TPC-H suite (all 22 queries) from the registry.

Usage:  python examples/tpch.py [sf_dir]        (default sf0.01)

Each query prints its row count and wall time; pass --explain to dump
the physical plan instead of executing (same flag as the CLI's
`query --explain`)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TPCH = (
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_important_stock", "q12_shipmode_priority",
    "q13_customer_distribution", "q14_promo_effect", "q15_top_supplier",
    "q16_parts_supplier_relation", "q17_small_qty_revenue", "q18_large_orders",
    "q19_disjunctive_join", "q20_part_promotion", "q21_suppliers_waiting",
    "q22_global_sales",
)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    explain = "--explain" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    from eth_event_tracker_spark.queries import REGISTRY, _load
    from eth_event_tracker_spark.session import get_spark

    _load()
    spark = get_spark("tpch-example")
    spark.sparkContext.setLogLevel("WARN")
    total = 0.0
    for name in TPCH:
        q = REGISTRY[name]
        if explain:
            print(f"=== {name} ===")
            q.fn(spark, sf_dir).explain("formatted")
            continue
        t0 = time.perf_counter()
        n = q.fn(spark, sf_dir).count()
        el = time.perf_counter() - t0
        total += el
        print(f"{name:32s} {n:8d} rows  {el:6.2f}s")
    if not explain:
        print(f"{'TOTAL':32s} {'':8s}       {total:6.2f}s")


if __name__ == "__main__":
    main()
