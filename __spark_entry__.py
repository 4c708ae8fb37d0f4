"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (smoke, sf0.001).
``queries()`` — every implemented operator from SURVEY.md §2, keyed by name.
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted only for
non-SQL-expressible ops, which get a rows-only check).

All real logic lives in ``eth_event_tracker_spark``; this module is a thin
adapter over its query registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's core
    filter semantics in one statement (P-1 address filter + P-2 positional
    topic with wildcard + S-5 indx assignment + S-8 per-address rollup —
    tracker.go:62-71, 52-58; postgresql_store.go:111-130)."""
    from pyspark.sql import functions as F

    from eth_event_tracker_spark.operators import filters as OPF
    from eth_event_tracker_spark.operators import indexing as OPI
    from eth_event_tracker_spark.tables import address_pool, derived_logs, sig_pool

    logs = derived_logs(spark, "/root/testdata/sf0.001")
    matched = OPF.topic_filter(OPF.address_filter(logs, address_pool()[:3]), [sig_pool()[0], None])
    indexed = OPI.assign_indx_scalable(matched)
    return indexed.groupBy("address").agg(
        F.count("*").alias("n_logs"),
        F.max("indx").alias("max_indx"),
        F.min("block_num").alias("first_block"),
        F.max("block_num").alias("last_block"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from eth_event_tracker_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from eth_event_tracker_spark.queries import all_oracles

    return all_oracles()
