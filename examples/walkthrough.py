"""The reference README's end-to-end example (README.md:28-111 — track a
contract's deposit events, resume from the last checkpoint, decode each
added log's LE-uint payload), re-expressed Spark-first.

Same beats, sandbox substitutions only: the JSON-RPC endpoint becomes the
in-process mock chain (the container has no node), the boltdb file store
becomes the reorg-aware ParquetStore, and the EventCh goroutine becomes
the events returned by sync()/poll() — plus what the reference can't do:
SQL over the tracked table, a replayable changelog, and store compaction.

    python examples/walkthrough.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from eth_event_tracker_spark.config import FilterConfig
from eth_event_tracker_spark.functions.hashing import le_uint_from_hex
from eth_event_tracker_spark.operators.filters import event_signature_filter
from eth_event_tracker_spark.session import get_spark
from eth_event_tracker_spark.sources.mock_chain import EVENT_SIGS, MockProvider
from eth_event_tracker_spark.sql import register_store_views
from eth_event_tracker_spark.store import ParquetStore
from eth_event_tracker_spark.streaming import Tracker
from eth_event_tracker_spark.streaming.pipeline import (
    append_changelog,
    current_view,
    maintain_changelog,
)

TARGET = "0x" + "aa" * 20  # the tracked contract (reference: -target flag)
DEPOSIT_SIG = EVENT_SIGS[0]  # topic0 of the event we decode


def main() -> None:
    spark = get_spark("walkthrough")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.TemporaryDirectory()

    # 1. provider + store + filter spec (reference: jsonrpc.NewClient,
    #    boltdbStore.New("deposit.db"), tracker.NewTracker(WithFilter(
    #    Address: target)) — README.md:46-66)
    provider = MockProvider()
    provider.advance(300, logs_per_block=2)
    store = ParquetStore(tmp.name)
    cfg = FilterConfig(addresses=(TARGET,), batch_size=100)
    tracker = Tracker(provider, store, cfg)
    clog = store.changelog_entry(cfg.filter_hash)

    # 2. resume point (reference: tt.GetLastBlock() — README.md:68-77)
    last = tracker.get_last_block()
    print("last block processed:", last.number if last else None)

    # 3. historical sync; consume events as the EventCh loop does
    #    (README.md:79-108), decoding each added log's payload uints
    #    (binary.LittleEndian.Uint64 → le_uint_from_hex)
    n_added = 0
    for ev in tracker.sync():
        append_changelog(clog, ev)
        n_added += len(ev.added)
    print(f"historical sync done: {n_added} logs on {TARGET[:10]}…")
    assert tracker.get_last_block() is not None  # checkpoint committed

    deposits = event_signature_filter(tracker.entry.df(spark), DEPOSIT_SIG)
    decoded = deposits.select(
        "block_num",
        le_uint_from_hex(F.lower(F.hex("data")), 6).alias("amount_le48"),
    )
    print("decoded deposit payloads:")
    decoded.orderBy(F.desc("block_num")).show(3)

    # 4. a 4-block reorg arrives at the head; poll() retracts and replaces
    #    (the reference pushes Removed logs on EventCh; here they are rows)
    provider.fork(4, logs_per_block=2)
    for ev in tracker.poll():
        append_changelog(clog, ev)
        print(f"reorg handled: removed {len(ev.removed)}, added {len(ev.added)}")

    # 5. what the reference cannot do: SQL over the tracked table...
    register_store_views(spark, store, cfg.filter_hash)
    spark.sql(
        "SELECT block_num DIV 100 AS era, COUNT(*) AS n_logs "
        "FROM tracked_logs GROUP BY 1 ORDER BY 1"
    ).show()

    # ...a replayable changelog whose live view matches the store...
    live = current_view(clog.df(spark))
    n_live = live.count()
    assert n_live == tracker.entry.last_index()
    print("changelog live view rows:", n_live, "(matches the store)")

    # ...and store-level retention: once the chain advances past the
    # finality horizon, the reorg's add/remove churn is history nobody can
    # act on — compact it away; the live view is bit-identical after
    provider.advance(2 * cfg.max_block_backlog, logs_per_block=2)
    for ev in tracker.poll():
        append_changelog(clog, ev)
    before = current_view(clog.df(spark)).count()
    stats = maintain_changelog(spark, clog, tracker)  # horizon = head − backlog
    assert current_view(clog.df(spark)).count() == before
    print(f"compacted changelog: {stats['rows_before']} → {stats['rows_after']} rows on disk")


if __name__ == "__main__":
    main()
