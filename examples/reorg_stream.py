"""End-to-end reorg-aware streaming demo: a mock chain syncs through the
`web3changelog` readStream source into an append-only changelog table,
survives a 5-block reorg with retractions, resumes from its checkpoint,
and folds to the canonical view — the reference's tracker loop
(tracker.go:763-829) as native Structured Streaming.

    python examples/reorg_stream.py
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from eth_event_tracker_spark.session import get_spark
from eth_event_tracker_spark.sources.changelog_source import register
from eth_event_tracker_spark.sources.file_chain import dump_chain
from eth_event_tracker_spark.sources.mock_chain import MockProvider


def drain(q, timeout=60):
    t0, stable = time.time(), 0
    while time.time() - t0 < timeout and stable < 4:
        time.sleep(0.5)
        st = q.status
        if q.lastProgress is not None and not st["isDataAvailable"] and not st["isTriggerActive"]:
            stable += 1
        else:
            stable = 0
    q.stop()
    q.awaitTermination(30)


def main() -> None:
    spark = get_spark("reorg-stream-demo")
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)

    with tempfile.TemporaryDirectory() as tmp:
        cdir, out, ckpt = f"{tmp}/chain", f"{tmp}/changelog", f"{tmp}/ckpt"
        prov = MockProvider()
        prov.advance(30, logs_per_block=2)
        dump_chain(prov, cdir)

        def run():
            q = (
                spark.readStream.format("web3changelog")
                .option("chain_dir", cdir)
                .option("max_blocks_per_batch", 10)
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .start()
            )
            drain(q)

        print("== phase 1: initial sync of 30 blocks ==")
        run()
        cl = spark.read.parquet(out)
        cl.groupBy("action").count().show()

        print("== phase 2: 5-block reorg, resume from checkpoint ==")
        prov.fork(5, logs_per_block=2)
        dump_chain(prov, cdir)
        run()
        cl = spark.read.parquet(out)
        cl.groupBy("action").count().show()

        print("== folded current view vs canonical chain ==")
        added = cl.where("action = 'added'").select("tx_hash", "block_hash")
        removed = cl.where("action = 'removed'").select("tx_hash", "block_hash")
        view = added.exceptAll(removed)
        n_view = view.count()
        n_canon = len(prov.get_logs(0, 30))
        print(f"current view rows = {n_view}, canonical chain logs = {n_canon}")
        assert n_view == n_canon
        print("OK: changelog folds to the canonical chain")


if __name__ == "__main__":
    main()
