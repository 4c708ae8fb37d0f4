"""Multi-filter wall-time linearity artifact (round-9 verdict item 6).

Drives N ∈ {10, 25, 50} concurrent filters (the mixed spec shapes of
tests/test_multi_filter.py) over one shared ParquetStore and one chain
history — sync all, one reorg, poll all — and records wall time per N
into ``multi_filter_scale.json``.  The reference enumerates many
persisted filters per store via ListPrefix (store/store.go:10-11);
aggregate cost should grow ~linearly in N because each filter's work is
its own scan + its own store entry, with no cross-filter coupling.

Run on an idle host:  python tools/multi_filter_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def run_once(n_filters: int) -> dict:
    from eth_event_tracker_spark.sources.mock_chain import MockProvider
    from eth_event_tracker_spark.store import ParquetStore
    from eth_event_tracker_spark.streaming import Tracker

    from tests.test_multi_filter import filter_mix

    prov = MockProvider()
    prov.advance(30, logs_per_block=2)
    specs = filter_mix(prov, n_filters)
    with tempfile.TemporaryDirectory() as tmp:
        store = ParquetStore(tmp)
        t0 = time.monotonic()
        trackers = [Tracker(prov, store, cfg) for cfg in specs]
        for t in trackers:
            t.sync()
        prov.fork(4, logs_per_block=2)
        for t in trackers:
            t.poll()
        wall = time.monotonic() - t0
        head = len(prov.canonical) - 1
        n_ok = sum(
            1
            for cfg, t in zip(specs, trackers)
            if {
                (lg["block_hash"], lg["tx_index"], lg["log_index"])
                for lg in t.entry.all_logs()
            }
            == {
                (lg["block_hash"], lg["tx_index"], lg["log_index"])
                for lg in prov.get_logs(0, head, cfg.addresses, cfg.topics)
            }
        )
    return {
        "n_filters": n_filters,
        "wall_sec": round(wall, 3),
        "per_filter_sec": round(wall / n_filters, 4),
        "n_ok": n_ok,
    }


def main() -> int:
    runs = [run_once(n) for n in (10, 25, 50)]
    ratio = runs[-1]["per_filter_sec"] / runs[0]["per_filter_sec"]
    art = {
        "runs": runs,
        "per_filter_ratio_last_vs_first": round(ratio, 3),
        "loadavg_start": os.getloadavg()[0],
    }
    out = os.path.join(ROOT, "multi_filter_scale.json")
    with open(out, "w") as fh:
        json.dump(art, fh, indent=1)
    print(json.dumps(art))
    ok = all(r["n_ok"] == r["n_filters"] for r in runs) and ratio < 2.0
    print(f"{'OK' if ok else 'FAIL'}: per-filter ratio {ratio:.2f} (linear-ish < 2.0)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
