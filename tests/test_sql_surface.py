"""Pure-SQL entry point: views registered, chain + fixture + tracked
tables queryable with spark.sql."""

from __future__ import annotations

from eth_event_tracker_spark.config import FilterConfig
from eth_event_tracker_spark.sources.mock_chain import MockProvider
from eth_event_tracker_spark.sql import register_store_views, register_views
from eth_event_tracker_spark.store import ParquetStore
from eth_event_tracker_spark.streaming import Tracker


def test_register_views(spark, sf_dir):
    names = register_views(spark, sf_dir)
    assert "logs" in names and "lineitem" in names
    n_logs = spark.sql("SELECT COUNT(*) AS n FROM logs").first().n
    n_events = spark.sql("SELECT COUNT(*) AS n FROM events").first().n
    assert n_logs == n_events  # one derived log per event
    top = spark.sql(
        """
        SELECT address, COUNT(*) AS n FROM logs GROUP BY address ORDER BY n DESC, address LIMIT 1
        """
    ).first()
    assert top.n > 0 and top.address.startswith("0x")
    # chain linkage queryable in SQL
    bad_links = spark.sql(
        """
        SELECT COUNT(*) AS n
        FROM blocks c JOIN blocks p ON c.block_num = p.block_num + 1
        WHERE c.parent_hash <> p.block_hash
        """
    ).first().n
    assert bad_links == 0


def test_register_store_views(spark, tmp_path):
    prov = MockProvider()
    prov.advance(15, logs_per_block=2)
    store = ParquetStore(tmp_path)
    t = Tracker(prov, store, FilterConfig())
    t.sync()
    names = register_store_views(spark, store, t.config.filter_hash)
    assert "tracked_logs" in names
    row = spark.sql(
        "SELECT COUNT(*) AS n, MAX(indx) AS mx FROM tracked_logs"
    ).first()
    assert row.n == 30 and row.mx == 29
