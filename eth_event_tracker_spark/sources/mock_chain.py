"""Deterministic mock chain + provider — the engine-side twin of the
reference's testutil.MockClient / MockList / MockBlock (used throughout
tracker_test.go): block i has hash f"0x{i:x}..." padded, an optional
per-block log set, and fork branches are expressed by giving a block a
different hash at the same height (Mock(0x30).Parent(0x2).Num(3)).

The provider surface mirrors the Provider interface the tracker consumes
(tracker.go:125-131): get_block_by_number / get_block_by_hash /
get_logs(filter) / chain_id / genesis — plus the Infura-style result cap
that drives AIMD batching (mockClientWithLimit, tracker_test.go:760-818).
"""

from __future__ import annotations

from dataclasses import dataclass, field


def _pad_hash(tag: int | str) -> str:
    s = f"{tag:x}" if isinstance(tag, int) else str(tag).removeprefix("0x")
    return "0x" + s.rjust(64, "0")


@dataclass(frozen=True)
class Header:
    number: int
    hash: str
    parent_hash: str
    difficulty: int = 0


@dataclass
class MockBlock:
    """Builder mirroring testutil.Mock(0x1).Log("0x1").Parent(0x2).Num(3)."""

    tag: int
    number: int | None = None
    parent_tag: int | None = None
    log_tags: list[str] = field(default_factory=list)

    def num(self, n: int) -> "MockBlock":
        self.number = n
        return self

    def parent(self, tag: int) -> "MockBlock":
        self.parent_tag = tag
        return self

    def log(self, *tags: str) -> "MockBlock":
        self.log_tags.extend(tags)
        return self

    @property
    def block_number(self) -> int:
        # Mock(0x30) with no explicit Num: number = low nibble heuristic is
        # NOT copied; callers set .num() for fork blocks, else number == tag.
        return self.number if self.number is not None else self.tag

    @property
    def hash(self) -> str:
        return _pad_hash(self.tag)

    @property
    def parent_hash(self) -> str:
        if self.parent_tag is not None:
            return _pad_hash(self.parent_tag)
        return _pad_hash(self.block_number - 1) if self.block_number > 0 else _pad_hash("deadbeef")

    def header(self) -> Header:
        return Header(self.block_number, self.hash, self.parent_hash)

    def logs(self, address: str = "0x" + "aa" * 20, topic0: str | None = None) -> list[dict]:
        out = []
        for i, tag in enumerate(self.log_tags):
            # topic0 = one of two event signatures, alternating by block tag
            # and log position (cf. events A/B in
            # TestFilterIntegrationEventHash, tracker_test.go:142-180);
            # topic1 = the unique log tag
            v = int(tag, 16)
            sig = topic0 or EVENT_SIGS[(v // 256 + v % 256) % 2]
            out.append(
                {
                    "log_index": i,
                    "tx_index": i,
                    "tx_hash": _pad_hash(tag),
                    "block_num": self.block_number,
                    "block_hash": self.hash,
                    "address": address,
                    "topics": [sig, _pad_hash(tag)],
                    "data": bytes.fromhex(f"{self.block_number:08x}{i:04x}"),
                }
            )
        return out


def mock(tag: int) -> MockBlock:
    return MockBlock(tag)


# the two mock event signatures (events A/B, tracker_test.go:148-171)
EVENT_SIGS = (_pad_hash("ee0"), _pad_hash("ee1"))


class TooMuchDataError(Exception):
    """The Infura-style server cap (tracker.go:332)."""

    def __init__(self) -> None:
        super().__init__("query returned more than 10000 results")


class MockProvider:
    """In-memory chain the tracker syncs from.

    ``advance``/``fork`` mutate the canonical chain like the randomized
    test's chain generator (tracker_test.go:369-482). ``add_scenario``
    registers off-canonical blocks reachable only by hash (fork ancestry
    for backfills, cf. MockClient.AddScenario).
    """

    def __init__(self, chain_id: int = 1337, logs_per_query_limit: int | None = None) -> None:
        self.chain_id = chain_id
        self.canonical: list[MockBlock] = [MockBlock(0)]  # genesis
        self.by_hash: dict[str, MockBlock] = {self.canonical[0].hash: self.canonical[0]}
        self.logs_per_query_limit = logs_per_query_limit
        self._next_tag = 1

    # -- chain construction -------------------------------------------------
    def add_block(self, b: MockBlock) -> MockBlock:
        assert b.block_number == len(self.canonical), "canonical blocks must be consecutive"
        self.canonical.append(b)
        self.by_hash[b.hash] = b
        return b

    def add_scenario(self, blocks: list[MockBlock]) -> None:
        for b in blocks:
            self.by_hash[b.hash] = b

    def advance(self, n: int = 1, logs_per_block: int = 0) -> None:
        for _ in range(n):
            num = len(self.canonical)
            b = MockBlock(self._next_tag, number=num, parent_tag=None)
            b.parent_tag = self.canonical[-1].tag
            self._next_tag += 1
            for j in range(logs_per_block):
                b.log(f"{b.tag:x}{j:02x}")
            self.add_block(b)

    def fork(self, depth: int, logs_per_block: int = 0) -> None:
        """Reorg the last ``depth`` canonical blocks onto a new branch."""
        assert 0 < depth < len(self.canonical)
        keep = self.canonical[:-depth]
        self.canonical = keep
        for _ in range(depth):
            self.advance(1, logs_per_block)

    # -- provider surface (tracker.go:125-131) ------------------------------
    def latest(self) -> Header:
        return self.canonical[-1].header()

    def get_block_by_number(self, n: int) -> Header | None:
        if 0 <= n < len(self.canonical):
            return self.canonical[n].header()
        return None

    def get_block_by_hash(self, h: str) -> Header | None:
        b = self.by_hash.get(h)
        return b.header() if b else None

    def genesis_hash(self) -> str:
        return self.canonical[0].hash

    def _match(self, log: dict, addresses, topics) -> bool:
        if addresses and log["address"] not in addresses:
            return False
        for i, t in enumerate(topics or ()):  # positional, None = wildcard
            if t is not None and (i >= len(log["topics"]) or log["topics"][i] != t):
                return False
        return True

    def get_logs(self, from_block: int, to_block: int, addresses=(), topics=()) -> list[dict]:
        """Range scan (S-1, eth_getLogs semantics) with the server-side
        result cap that triggers AIMD halving (tracker_test.go:772-789)."""
        out = []
        for b in self.canonical[from_block : to_block + 1]:
            for lg in b.logs():
                if self._match(lg, set(addresses), tuple(topics)):
                    out.append(lg)
        if self.logs_per_query_limit is not None and len(out) > self.logs_per_query_limit:
            raise TooMuchDataError()
        return out

    def get_logs_by_hash(self, block_hash: str, addresses=(), topics=()) -> list[dict]:
        """Fork-exact per-block scan (S-2, tracker.go:797-815)."""
        b = self.by_hash.get(block_hash)
        if b is None:
            return []
        return [lg for lg in b.logs() if self._match(lg, set(addresses), tuple(topics))]


class MockActivityIndex:
    """The Etherscan-style first-activity index the fast-track probe
    queries (tracker.go:446-519): per-address first block containing a
    matching log."""

    def __init__(self, provider: MockProvider) -> None:
        self.provider = provider
        self.calls = 0

    def first_activity_block(self, address: str) -> int | None:
        self.calls += 1
        for b in self.provider.canonical:
            for lg in b.logs():
                if lg["address"].lower() == address.lower():
                    return b.block_number
        return None


class CountingProvider:
    """Wraps a provider counting get_logs range calls (for skip-scan
    assertions)."""

    def __init__(self, inner: MockProvider) -> None:
        self._inner = inner
        self.get_logs_calls: list[tuple[int, int]] = []

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def get_logs(self, from_block, to_block, addresses=(), topics=()):
        self.get_logs_calls.append((from_block, to_block))
        return self._inner.get_logs(from_block, to_block, addresses, topics)
