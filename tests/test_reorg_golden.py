"""Golden reconcile cases — semantic port of TestTrackerReconcile
(/root/reference/tracker_test.go:484-758): named scenarios, each with a
history, one incoming head block, the expected Added/Removed changelog,
and the expected post-state of both the store and the head window."""

from __future__ import annotations

import pytest

from eth_event_tracker_spark.config import FilterConfig
from eth_event_tracker_spark.reorg import HeadWindow, ReorgTooDeepError, reconcile
from eth_event_tracker_spark.sources.mock_chain import MockProvider, mock
from eth_event_tracker_spark.store import ParquetStore
from eth_event_tracker_spark.streaming import Tracker

CASES = {
    # name: (scenario, history, incoming, expected_added_tags,
    #        expected_removed_tags, expected_window_tags)
    "empty_history": ([], [], mock(0x1).log("0x1"), [0x1], [], [0x1]),
    "repeated_header": ([], [mock(0x1)], mock(0x1), None, None, [0x1]),
    "new_head": ([], [mock(0x1)], mock(0x2), [0x2], [], [0x1, 0x2]),
    "already_known": ([], [mock(0x1), mock(0x2), mock(0x3)], mock(0x2), None, None, [0x1, 0x2, 0x3]),
    "multi_rollback": (
        [],
        [mock(0x1), mock(0x2), mock(0x3).log("0x3"), mock(0x4).log("0x4")],
        mock(0x30).parent(0x2).num(3).log("0x30"),
        [0x30],
        [0x3, 0x4],
        [0x1, 0x2, 0x30],
    ),
    "backfill_missing": (
        [mock(0x3), mock(0x4).log("0x2")],
        [mock(0x1).log("0x1"), mock(0x2)],
        mock(0x5).log("0x3"),
        [0x3, 0x4, 0x5],
        [],
        [0x1, 0x2, 0x3, 0x4, 0x5],
    ),
    "rollback_and_backfill": (
        [mock(0x30).parent(0x2).num(3).log("0x5"), mock(0x40).parent(0x30).num(4)],
        [mock(0x1), mock(0x2).log("0x3"), mock(0x3).log("0x2"), mock(0x4).log("0x1")],
        mock(0x50).parent(0x40).num(5),
        [0x30, 0x40, 0x50],
        [0x3, 0x4],
        [0x1, 0x2, 0x30, 0x40, 0x50],
    ),
}


def _build(tmp_path, scenario, history):
    prov = MockProvider()
    prov.add_scenario(scenario + history)
    # incoming blocks are fetched by hash too
    store = ParquetStore(tmp_path / "store")
    t = Tracker(prov, store, FilterConfig())
    for b in history:
        t.window.blocks.append(b.header())
        t.entry.store_logs(b.logs())
    return prov, t


@pytest.mark.parametrize("name", list(CASES))
def test_golden_reconcile(tmp_path, name):
    scenario, history, incoming, exp_added, exp_removed, exp_window = CASES[name]
    prov, t = _build(tmp_path, scenario, history)
    prov.add_scenario([incoming])

    evnt = t.handle_head(incoming.header())

    if exp_added is None:  # no event expected
        assert evnt is None
    else:
        added_blocks = {b.hash for b in map(mock, exp_added)} if exp_added else set()
        exp_added_logs = [lg for tag in exp_added for lg in mock_logs(scenario, history, incoming, tag)]
        assert [r["tx_hash"] for r in evnt.added] == [lg["tx_hash"] for lg in exp_added_logs]
        assert {r["block_hash"] for r in evnt.added} <= added_blocks | {incoming.hash}
        exp_removed_logs = [lg for tag in exp_removed for lg in mock_logs(scenario, history, incoming, tag)]
        assert [r["tx_hash"] for r in evnt.removed] == [lg["tx_hash"] for lg in exp_removed_logs]

    # post-state: window
    assert [b.hash for b in t.window.blocks] == [mock(tag).hash for tag in exp_window]
    # post-state: store holds exactly the logs of the expected final chain
    final_tags_with_logs = []
    for tag in exp_window:
        final_tags_with_logs.extend(mock_logs(scenario, history, incoming, tag))
    assert [r["tx_hash"] for r in t.entry.all_logs()] == [lg["tx_hash"] for lg in final_tags_with_logs]
    # indx dense + monotonic (S-5 invariant)
    idxs = [r["indx"] for r in t.entry.all_logs()]
    assert idxs == list(range(len(idxs)))


def mock_logs(scenario, history, incoming, tag):
    for b in scenario + history + [incoming]:
        if b.tag == tag:
            return b.logs()
    return mock(tag).logs() if mock(tag).log_tags else []


def test_reorg_too_deep(tmp_path):
    prov = MockProvider()
    history = [mock(i) for i in range(1, 8)]
    store = ParquetStore(tmp_path / "store")
    t = Tracker(prov, store, FilterConfig())
    t.config = FilterConfig(max_block_backlog=3)
    t.window = HeadWindow(max_backlog=3)
    for b in history:
        t.window.blocks.append(b.header())
    t.window.trim()
    # a fork whose ancestry never connects to the trimmed window
    deep = mock(0x99).parent(0x98).num(7)
    with pytest.raises(ReorgTooDeepError):
        reconcile(t.window, deep.header(), prov.get_block_by_hash)
