"""End-to-end demo: track a (mock) chain, survive a reorg, query the
result three ways — library API, pure SQL, and the changelog view.

    python examples/demo.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from eth_event_tracker_spark.config import FilterConfig
from eth_event_tracker_spark.session import get_spark
from eth_event_tracker_spark.sources.mock_chain import EVENT_SIGS, MockProvider
from eth_event_tracker_spark.sql import register_store_views
from eth_event_tracker_spark.store import ParquetStore
from eth_event_tracker_spark.streaming import Tracker
from eth_event_tracker_spark.streaming.pipeline import append_changelog, current_view


def main() -> None:
    spark = get_spark("demo")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.TemporaryDirectory()
    # 1. a chain with 200 blocks x 2 logs, tracked by event signature
    prov = MockProvider()
    prov.advance(200, logs_per_block=2)
    store = ParquetStore(tmp.name)
    cfg = FilterConfig(topics=(EVENT_SIGS[0],), batch_size=50)
    tracker = Tracker(prov, store, cfg)
    clog = store.changelog_entry(cfg.filter_hash)

    for ev in tracker.sync():
        append_changelog(clog, ev)
    print(f"synced: {tracker.entry.last_index()} logs match signature {EVENT_SIGS[0][:10]}…")

    # 2. a 4-block reorg arrives; the tracker retracts and replaces
    prov.fork(4, logs_per_block=2)
    for ev in tracker.poll():
        append_changelog(clog, ev)
        print(f"reorg: removed {len(ev.removed)}, added {len(ev.added)}")

    # 3a. library read: the entry as a DataFrame
    df = tracker.entry.df(spark)
    print("entry rows:", df.count(), "max block:", df.agg({"block_num": "max"}).first()[0])

    # 3b. pure SQL over the tracked table
    register_store_views(spark, store, cfg.filter_hash)
    spark.sql(
        """
        SELECT block_num DIV 50 AS era, COUNT(*) AS n
        FROM tracked_logs GROUP BY 1 ORDER BY 1
        """
    ).show()

    # 3c. the changelog reconstructs the same live view
    live = current_view(clog.df(spark))
    assert live.count() == tracker.entry.last_index()
    print("changelog current_view matches the store:", live.count(), "rows")


if __name__ == "__main__":
    main()
