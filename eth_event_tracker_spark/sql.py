"""SQL surface: register every engine table as a temp view so users can
work in pure ``spark.sql`` — the fixtures, the derived chain tables, and
any tracked entry/changelog stores.

A user of the reference queries their PostgreSQL store with SQL
(logs_<hash> tables, postgresql_store.go:79-89); this is the equivalent
entry point here.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .store import ParquetStore
from .tables import TABLE_NAMES, derived_blocks, derived_kv, derived_logs, load_table


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create temp views: the 10 fixture tables + derived logs/blocks/kv."""
    names = []
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
        names.append(n)
    derived_logs(spark, sf_dir).createOrReplaceTempView("logs")
    derived_blocks(spark, sf_dir).createOrReplaceTempView("blocks")
    derived_kv(spark, sf_dir).createOrReplaceTempView("kv")
    names += ["logs", "blocks", "kv"]
    return names


def register_store_views(spark: SparkSession, store: ParquetStore, filter_hash: str) -> list[str]:
    """Expose a tracked filter's entry (and changelog, if present) as SQL
    views — the `logs_<hash>` table of the reference's pg backend."""
    names = []
    entry = store.entry(filter_hash)
    entry.df(spark).createOrReplaceTempView("tracked_logs")
    names.append("tracked_logs")
    clog_path = store.root / "entries" / f"changelog_{filter_hash}"
    if clog_path.exists() and any(clog_path.glob("bucket=*")):
        store.changelog_entry(filter_hash).df(spark).createOrReplaceTempView("tracked_changelog")
        names.append("tracked_changelog")
    return names
