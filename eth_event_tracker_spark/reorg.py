"""Head-window reconcile — the reorg state machine of the reference
(blocktracker's rolling last-N window + HandleBlockEvent diff, consumed by
tracker.handleBlockEvnt, tracker.go:763-784; golden semantics defined by
TestTrackerReconcile, tracker_test.go:484-758).

Design note (why this is driver-side Python, not a DataFrame op): the
mutable head window is bounded at MaxBlockBacklog = 10 blocks
(tracker.go:34) — O(10) state, regardless of whether the table behind it
is 10 MB or 100 TB.  The *data-scale* consequences of a diff (appending
added logs, retracting removed ones) are DataFrame/parquet operations in
``store`` and ``streaming``; only the head bookkeeping lives here.  This
mirrors Structured Streaming itself, where offsets/commit logs are tiny
driver-side state and the data path is distributed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .sources.mock_chain import Header


class ReorgTooDeepError(Exception):
    """Reorg deeper than the backlog window (tracker.go:313 'cannot find
    common ancestor')."""


@dataclass
class BlockDiff:
    """The reference's blocktracker.BlockEvent{Added, Removed}
    (tracker.go:848-853)."""

    added: list[Header] = field(default_factory=list)
    removed: list[Header] = field(default_factory=list)

    @property
    def empty(self) -> bool:
        return not self.added and not self.removed


@dataclass
class HeadWindow:
    """Rolling window of the last ≤ max_backlog headers (blocktracker's
    BlocksBlocked)."""

    max_backlog: int = 10  # defaultMaxBlockBacklog, tracker.go:34
    blocks: list[Header] = field(default_factory=list)

    def hashes(self) -> set[str]:
        return {b.hash for b in self.blocks}

    def trim(self) -> None:
        if len(self.blocks) > self.max_backlog:
            del self.blocks[: len(self.blocks) - self.max_backlog]


def reconcile(window: HeadWindow, incoming: Header, get_block_by_hash) -> BlockDiff:
    """Compute the Added/Removed diff for one head event and update the
    window in place.

    Golden semantics (tracker_test.go:484-758):
      - repeated header / block already in window  → empty diff
      - child of current head                      → added=[incoming]
      - gap to head (missing parents)              → backfill: walk
        incoming's ancestry by parent_hash until it connects to the
        window; all walked blocks are added, oldest first
      - fork (ancestry connects to a non-tail window block) → removed =
        window blocks above the connection point, added = the new branch
      - ancestry fails to connect within max_backlog steps → ReorgTooDeepError
        (findAncestor bound, tracker.go:291-314)
    """
    if incoming.hash in window.hashes():
        return BlockDiff()  # "Repeated header" / "Ignore block already on history"

    if not window.blocks:
        window.blocks.append(incoming)
        window.trim()
        return BlockDiff(added=[incoming])

    # walk the incoming branch back until it connects to the window
    branch: list[Header] = [incoming]
    known = {b.hash: i for i, b in enumerate(window.blocks)}
    steps = 0
    while branch[0].parent_hash not in known:
        if branch[0].number <= window.blocks[0].number or steps >= window.max_backlog:
            raise ReorgTooDeepError(
                f"cannot find common ancestor within backlog={window.max_backlog}"
            )
        parent = get_block_by_hash(branch[0].parent_hash)
        if parent is None:
            raise ReorgTooDeepError(f"missing ancestor block {branch[0].parent_hash}")
        branch.insert(0, parent)
        steps += 1

    connect_at = known[branch[0].parent_hash]
    removed = window.blocks[connect_at + 1 :]
    window.blocks = window.blocks[: connect_at + 1] + branch
    window.trim()
    return BlockDiff(added=branch, removed=removed)
