"""Property-based reconcile testing (hypothesis) — the reference's
randomized invariant suite (TestTrackerSyncerRandom,
tracker_test.go:369-482) expressed as generated operation sequences:
any mix of advances and bounded-depth forks keeps the head window equal
to the chain tail and balances the add/remove accounting."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from eth_event_tracker_spark.reorg import HeadWindow, reconcile
from eth_event_tracker_spark.sources.mock_chain import MockProvider

ops = st.lists(
    st.one_of(
        st.tuples(st.just("advance"), st.integers(1, 4)),
        st.tuples(st.just("fork"), st.integers(1, 5)),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=40, deadline=None)
@given(ops=ops, backlog=st.integers(6, 12))
def test_reconcile_invariants(ops, backlog):
    prov = MockProvider()
    prov.advance(8)
    window = HeadWindow(max_backlog=backlog)
    # seed: feed the existing chain head-by-head
    for b in prov.canonical:
        reconcile(window, b.header(), prov.get_block_by_hash)

    added_total = removed_total = 0
    for op, n in ops:
        if op == "advance":
            prov.advance(n)
        else:
            if len(prov.canonical) <= n + 1:
                continue
            prov.fork(n)
        # deliver only the new head; reconcile must backfill the gap itself
        diff = reconcile(window, prov.latest(), prov.get_block_by_hash)
        added_total += len(diff.added)
        removed_total += len(diff.removed)

        tail = prov.canonical[-backlog:]
        assert [b.hash for b in window.blocks] == [b.hash for b in tail]
        assert len(window.blocks) <= backlog
        # every removed block is off-canonical now
        canon = {b.hash for b in prov.canonical}
        for r in diff.removed:
            assert r.hash not in canon

    assert added_total >= removed_total


@settings(max_examples=20, deadline=None)
@given(depth=st.integers(1, 5))
def test_fork_depth_within_backlog_never_errors(depth):
    prov = MockProvider()
    prov.advance(20)
    window = HeadWindow(max_backlog=10)
    for b in prov.canonical:
        reconcile(window, b.header(), prov.get_block_by_hash)
    prov.fork(depth)
    diff = reconcile(window, prov.latest(), prov.get_block_by_hash)
    assert len(diff.removed) == depth
    assert len(diff.added) == depth
