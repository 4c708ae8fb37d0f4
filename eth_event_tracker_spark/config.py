"""Filter configuration and identity.

A filter *is* a query in the reference; its identity is the SHA-256 of its
address list + topic list (FilterConfig.buildHash, tracker.go:47-60).  The
same recipe here: the hash names the checkpoint location and the output
partition, so an identical filter resumes where it left off
(tracker.go:177-211).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class FilterConfig:
    """Declarative spec of which logs to track.

    Mirrors FilterConfig at tracker.go:38-45:
      - ``addresses``: match logs whose emitting contract is in the set
        (empty = match all) — pushed down to the source (tracker.go:62-71).
      - ``topics``: positional; ``None`` at position i is a wildcard
        (tracker_test.go:136).
      - ``start_block``: skip-scan override (tracker.go:42 ``Start``).
    """

    addresses: tuple[str, ...] = field(default=())
    topics: tuple[str | None, ...] = field(default=())
    start_block: int = 0
    batch_size: int = 100  # defaultBatchSize, tracker.go:35
    max_block_backlog: int = 10  # defaultMaxBlockBacklog, tracker.go:34

    @property
    def filter_hash(self) -> str:
        """SHA-256 identity of (addresses, topics) — same semantics as
        FilterConfig.buildHash (tracker.go:47-60): deterministic digest of
        the address list then the topic list, wildcards included."""
        h = hashlib.sha256()
        for a in self.addresses:
            h.update(a.lower().encode())
        for t in self.topics:
            h.update(b"\x00" if t is None else t.lower().encode())
        return h.hexdigest()

    def to_json(self) -> str:
        return json.dumps(
            {
                "addresses": list(self.addresses),
                "topics": list(self.topics),
                "start_block": self.start_block,
                "batch_size": self.batch_size,
                "max_block_backlog": self.max_block_backlog,
            },
            sort_keys=True,
        )

    @staticmethod
    def from_json(s: str) -> "FilterConfig":
        d = json.loads(s)
        return FilterConfig(
            addresses=tuple(d.get("addresses", ())),
            topics=tuple(d.get("topics", ())),
            start_block=int(d.get("start_block", 0)),
            batch_size=int(d.get("batch_size", 100)),
            max_block_backlog=int(d.get("max_block_backlog", 10)),
        )


# KV keys used by the tracker (tracker.go:26-31).
KEY_GENESIS = "genesis"
KEY_CHAIN_ID = "chainID"


def key_last_block(filter_hash: str) -> str:
    return f"lastBlock_{filter_hash}"


def key_filter(filter_hash: str) -> str:
    return f"filter_{filter_hash}"
