"""Model-based changelog fuzzing — randomized add/reorg churn with
compaction at arbitrary (valid) finality horizons, across backends.

The model is the FULL append-only changelog (never compacted), held as
plain Python rows; the store under test compacts.  After every step the
store's reconstructed live view must equal the model's, and everything
at/above the highest horizon ever compacted must survive byte-identical
(replay history is only collapsible below finality).  This is the
randomized counterpart of the golden compaction cases in
tests/test_pipeline.py / test_store_conformance.py — interleavings a
fixed suite never enumerates.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

from hypothesis import given, settings
from hypothesis import strategies as st

from eth_event_tracker_spark.sources.mock_chain import mock
from eth_event_tracker_spark.store import ParquetStore, SqlStore
from eth_event_tracker_spark.store.inmem_store import InMemStore

# an op is one of:
#   ("add", n_logs)         one new head block with n logs
#   ("reorg", depth)        retract up to `depth` head blocks, re-add twins
#   ("compact", frac)       compact at horizon = frac-point of the head
_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("add"), st.integers(1, 3)),
        st.tuples(st.just("reorg"), st.integers(1, 3)),
        st.tuples(st.just("compact"), st.floats(0.0, 1.0)),
    ),
    min_size=1,
    max_size=10,
)


def _pview(rows) -> dict:
    """Pure-python current_view: winning row per natural key when its
    latest change is an 'add' — key → (indx, tx_hash) of the winner."""
    latest: dict[tuple, dict] = {}
    for r in rows:
        k = (r["block_hash"], r["tx_index"], r["log_index"])
        if k not in latest or r["indx"] > latest[k]["indx"]:
            latest[k] = r
    return {
        k: (v["indx"], v["tx_hash"])
        for k, v in latest.items()
        if v["change_type"] == "add"
    }


def _tail(rows, horizon) -> list[tuple]:
    return sorted(
        (r["indx"], r["block_hash"], r["change_type"])
        for r in rows
        if r["block_num"] >= horizon
    )


class _Chain:
    """Driver-side chain simulator emitting changelog rows."""

    def __init__(self) -> None:
        self.blocks: list[tuple[int, list[dict]]] = []  # (block_num, live rows)
        self.full: list[dict] = []  # the model: every row ever appended
        self.tag = 0

    def _block(self, num: int, n: int) -> list[dict]:
        self.tag += 1
        b = mock(self.tag % 0xFF or 1).num(num)
        for i in range(n):
            b.log(f"{(self.tag % 0xFF or 1):x}{i:02x}")
        return b.logs()

    def add(self, entry, n: int) -> None:
        num = (self.blocks[-1][0] + 1) if self.blocks else 1
        logs = self._block(num, n)
        rows = [{**lg, "change_type": "add"} for lg in logs]
        stored = entry.store_logs([dict(r) for r in rows])
        self.full.extend(stored)
        self.blocks.append((num, logs))

    def reorg(self, entry, depth: int, floor: int) -> None:
        """Retract up to `depth` head blocks (never below `floor` — the
        highest compacted horizon: finalized blocks cannot reorg) and
        re-add replacement blocks at the same heights."""
        depth = min(depth, len(self.blocks))
        while depth and self.blocks[-depth][0] < floor:
            depth -= 1
        if depth <= 0:
            return
        victims = self.blocks[-depth:]
        del self.blocks[-depth:]
        removes = [
            {**lg, "change_type": "remove"}
            for _, logs in reversed(victims)
            for lg in reversed(logs)
        ]
        stored = entry.store_logs([dict(r) for r in removes])
        self.full.extend(stored)
        for num, _ in victims:
            self.add_at(entry, num)

    def add_at(self, entry, num: int) -> None:
        logs = self._block(num, 2)
        rows = [{**lg, "change_type": "add"} for lg in logs]
        stored = entry.store_logs([dict(r) for r in rows])
        self.full.extend(stored)
        self.blocks.append((num, logs))

    def head(self) -> int:
        return self.blocks[-1][0] if self.blocks else 0


def _run(ops, entry_factory, spark, reopen=None):
    entry = entry_factory()
    chain = _Chain()
    hmax = 0  # highest horizon ever compacted: finality floor
    for step, op in enumerate(ops):
        if op[0] == "add":
            chain.add(entry, op[1])
        elif op[0] == "reorg":
            if chain.blocks:
                chain.reorg(entry, op[1], hmax)
        else:  # compact
            horizon = int(op[1] * (chain.head() + 1))
            entry.compact_changelog(spark, finalized_below=horizon)
            hmax = max(hmax, horizon)
            if reopen is not None:
                entry = reopen()
        stored = entry.all_logs()
        assert _pview(stored) == _pview(chain.full), f"live view after step {step}"
        assert _tail(stored, hmax) == _tail(chain.full, hmax), (
            f"replay history at/above horizon {hmax} after step {step}"
        )
        assert entry.last_index() == len(chain.full), f"counter after step {step}"


@settings(max_examples=15, deadline=None)
@given(ops=_OPS)
def test_inmem_changelog_compaction_fuzz(ops):
    _run(ops, lambda: InMemStore().changelog_entry("cl"), spark=None)


@settings(max_examples=15, deadline=None)
@given(ops=_OPS)
def test_sqlite_changelog_compaction_fuzz(ops):
    with tempfile.TemporaryDirectory() as tmp:
        _run(ops, lambda: SqlStore(Path(tmp) / "s.db").changelog_entry("cl"), spark=None)


@settings(max_examples=8, deadline=None)
@given(ops=_OPS)
def test_parquet_changelog_compaction_fuzz(ops, spark):
    """Parquet arm reopens the entry after every compaction — the swap
    protocol and recovery path run under every randomized interleaving
    (each compaction is a Spark job; fewer examples)."""
    with tempfile.TemporaryDirectory() as tmp:
        store = ParquetStore(Path(tmp))
        _run(
            ops,
            lambda: store.changelog_entry("cl", bucket_size=4),
            spark,
            reopen=lambda: ParquetStore(Path(tmp)).changelog_entry("cl", bucket_size=4),
        )
