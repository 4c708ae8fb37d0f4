"""Temporal queries over a tracked table: time-travel, SCD2 intervals,
and incrementally-maintained aggregates — all from the changelog one
tracker run leaves behind (no re-sync, no snapshots).

    python examples/temporal.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from eth_event_tracker_spark.config import FilterConfig
from eth_event_tracker_spark.session import get_spark
from eth_event_tracker_spark.sources.mock_chain import MockProvider
from eth_event_tracker_spark.store import ParquetStore
from eth_event_tracker_spark.streaming import Tracker
from eth_event_tracker_spark.streaming.pipeline import (
    append_changelog,
    current_view,
    incremental_agg,
    validity_intervals,
    view_as_of,
    views_as_of,
)


def main() -> None:
    spark = get_spark()
    workdir = Path(tempfile.mkdtemp(prefix="eets_temporal_"))

    # --- a chain with history: sync 25 blocks, then two reorg cycles ---
    prov = MockProvider()
    prov.advance(25, logs_per_block=1)
    store = ParquetStore(workdir / "store")
    tracker = Tracker(prov, store, FilterConfig())
    clog = store.changelog_entry(tracker.config.filter_hash)
    marks = {}
    for e in tracker.sync():
        append_changelog(clog, e)
    marks["after_sync"] = clog.last_index() - 1
    for cycle in range(2):
        prov.fork(3, logs_per_block=1)
        for e in tracker.poll():
            append_changelog(clog, e)
        prov.advance(2, logs_per_block=1)
        for e in tracker.poll():
            append_changelog(clog, e)
        marks[f"after_reorg_{cycle}"] = clog.last_index() - 1

    cdf = clog.df(spark).cache()
    print(f"changelog rows: {cdf.count()} (adds + retractions, append-only)")

    # --- 1. time-travel: the table as it stood at each mark ------------
    instants = spark.createDataFrame(
        [(name, indx) for name, indx in marks.items()], "view_label string, _as_of long"
    )
    snap = (
        views_as_of(cdf, instants)
        .groupBy("view_label")
        .agg(F.count("*").alias("rows"), F.max("block_num").alias("head"))
        .orderBy("view_label")
    )
    print("\n-- view_as_of at recorded marks (one pass, all instants) --")
    snap.show(truncate=False)

    # --- 2. SCD2: validity intervals per log row -----------------------
    iv = validity_intervals(cdf)
    closed = iv.where("valid_to IS NOT NULL")
    print("-- SCD2: reorged-out rows carry closed [valid_from, valid_to) --")
    closed.select("block_num", "valid_from", "valid_to").orderBy("valid_from").show(
        6, truncate=False
    )
    live_now = iv.where("valid_to IS NULL").count()
    assert live_now == current_view(cdf).count()
    print(f"live rows (null valid_to): {live_now} == current_view")

    # --- 3. incremental aggregate maintenance --------------------------
    maintained = incremental_agg(cdf, keys=("block_num",))
    recomputed = current_view(cdf).groupBy("block_num").agg(F.count("*").alias("n_live"))
    diff = maintained.exceptAll(recomputed).count() + recomputed.exceptAll(maintained).count()
    print(f"signed ±1 maintenance vs reconstruct-then-aggregate: diff rows = {diff}")
    assert diff == 0

    # --- 4. the mid-reorg instant nobody snapshotted -------------------
    mid = (marks["after_sync"] + marks["after_reorg_0"]) // 2
    print(f"rows at un-snapshotted instant {mid}: {view_as_of(cdf, mid).count()}")
    spark.stop()


if __name__ == "__main__":
    main()
