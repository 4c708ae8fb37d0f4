"""File-backed chain — a MockProvider-compatible chain that lives on disk
so Spark *executor tasks* can read it (the in-memory MockProvider exists
only on the driver).  Stands in for a JSON-RPC endpoint: in production the
data source's ``read()`` would issue eth_getLogs over HTTP; here it reads
the same shapes from JSONL.

Layout: <dir>/blocks.jsonl — one JSON object per canonical block
{number, hash, parent_hash, logs: [...]}, append-only; reorgs rewrite the
file (the file is the chain's current canonical view, like a node's)."""

from __future__ import annotations

import json
import os
from pathlib import Path

from .mock_chain import Header, MockProvider


def dump_chain(provider: MockProvider, chain_dir: str | os.PathLike) -> None:
    """Serialize the provider's canonical chain (overwrite-on-reorg)."""
    d = Path(chain_dir)
    d.mkdir(parents=True, exist_ok=True)
    tmp = d / "blocks.jsonl.tmp"
    with tmp.open("w") as f:
        for b in provider.canonical:
            rec = {
                "number": b.block_number,
                "hash": b.hash,
                "parent_hash": b.parent_hash,
                "logs": [
                    {**lg, "data": lg["data"].hex()} for lg in b.logs()
                ],
            }
            f.write(json.dumps(rec) + "\n")
    os.replace(tmp, d / "blocks.jsonl")
    # by-hash table: EVERY block the provider has ever seen, including
    # orphaned fork branches — the stand-in for a node's fetch-by-hash
    # surface (S-2, tracker.go:797-815).  This only grows, which is what
    # makes the reorg-aware changelog source's offsets replayable: a
    # restarted micro-batch re-fetches its exact blocks by hash even
    # after the canonical file was rewritten by a later reorg.
    tmp2 = d / "by_hash.jsonl.tmp"
    with tmp2.open("w") as f:
        for b in provider.by_hash.values():
            rec = {
                "number": b.block_number,
                "hash": b.hash,
                "parent_hash": b.parent_hash,
                "logs": [{**lg, "data": lg["data"].hex()} for lg in b.logs()],
            }
            f.write(json.dumps(rec) + "\n")
    os.replace(tmp2, d / "by_hash.jsonl")
    (d / "meta.json").write_text(
        json.dumps({"chain_id": provider.chain_id, "genesis": provider.genesis_hash()})
    )


# Process-level parse memo keyed by (path, kind) -> ((mtime_ns, size), parsed).
# dump_chain only ever os.replace()s whole files, so (mtime_ns, size) pins the
# content; a changed file misses the memo and is re-parsed.  This matters for
# the streaming sources: the per-query source-runner interpreter calls
# latestOffset() every trigger (1 s in the deployment shape), and reused
# daemon task workers call read() once per partition — each used to re-parse
# the full chain JSONL per call.  Heavyweight work now happens once per
# process per file version (optimization guide §4.5).  Parsed objects are
# shared read-only; no engine consumer mutates them.  Bounded FIFO so long
# test sessions over many tmp chains don't accumulate.
_PARSE_MEMO: dict[tuple[str, str], tuple[tuple[int, int], object]] = {}
_PARSE_MEMO_MAX = 8


def _memoized_parse(path: Path, kind: str, parse) -> object:
    st = os.stat(path)
    key = (str(path), kind)
    sig = (st.st_mtime_ns, st.st_size)
    hit = _PARSE_MEMO.get(key)
    if hit is not None and hit[0] == sig:
        return hit[1]
    obj = parse(path)
    if len(_PARSE_MEMO) >= _PARSE_MEMO_MAX:
        _PARSE_MEMO.pop(next(iter(_PARSE_MEMO)))
    _PARSE_MEMO[key] = (sig, obj)
    return obj


def _parse_jsonl(path: Path) -> list[dict]:
    with path.open() as f:
        return [json.loads(line) for line in f if line.strip()]


class FileChainReader:
    """Task-side reader of a dumped chain."""

    def __init__(self, chain_dir: str) -> None:
        self.dir = Path(chain_dir)
        self._blocks: list[dict] | None = None
        self._by_hash: dict[str, dict] | None = None

    @property
    def blocks(self) -> list[dict]:
        if self._blocks is None:
            self._blocks = _memoized_parse(
                self.dir / "blocks.jsonl", "blocks", _parse_jsonl
            )
        return self._blocks

    def meta(self) -> dict:
        return json.loads((self.dir / "meta.json").read_text())

    def head(self) -> Header:
        b = self.blocks[-1]
        return Header(b["number"], b["hash"], b["parent_hash"])

    @staticmethod
    def _match(lg: dict, addr: set[str], topics) -> bool:
        if addr and lg["address"].lower() not in addr:
            return False
        for i, t in enumerate(topics or ()):
            if t is not None and (i >= len(lg["topics"]) or lg["topics"][i] != t):
                return False
        return True

    def get_logs(self, from_block: int, to_block: int, addresses=(), topics=()) -> list[dict]:
        addr = {a.lower() for a in addresses}
        return [
            lg
            for b in self.blocks[from_block : to_block + 1]
            for lg in b["logs"]
            if self._match(lg, addr, topics)
        ]

    @property
    def by_hash(self) -> dict[str, dict]:
        """Every block ever dumped, keyed by hash (incl. orphans).  Falls
        back to the canonical file for chains dumped before by_hash.jsonl
        existed."""
        if self._by_hash is None:
            p = self.dir / "by_hash.jsonl"
            if p.exists():
                self._by_hash = _memoized_parse(
                    p,
                    "by_hash",
                    lambda q: {b["hash"]: b for b in _parse_jsonl(q)},
                )
            else:
                self._by_hash = {b["hash"]: b for b in self.blocks}
        return self._by_hash

    def header_by_hash(self, h: str) -> Header | None:
        b = self.by_hash.get(h)
        return Header(b["number"], b["hash"], b["parent_hash"]) if b else None

    def get_logs_by_hash(self, block_hash: str, addresses=(), topics=()) -> list[dict]:
        """Fork-exact per-block scan (S-2) — serves orphaned blocks too,
        which is what makes reorg retractions replayable."""
        b = self.by_hash.get(block_hash)
        if b is None:
            return []
        addr = {a.lower() for a in addresses}
        return [lg for lg in b["logs"] if self._match(lg, addr, topics)]

    def count_logs_per_block(
        self, from_block: int, to_block: int, addresses=(), topics=()
    ) -> list[int]:
        """Per-block matching-log counts — the admission-control path: the
        stream reader's AIMD probe needs only counts, never row data, so
        the driver stays O(blocks) regardless of log density."""
        addr = {a.lower() for a in addresses}
        return [
            sum(1 for lg in b["logs"] if self._match(lg, addr, topics))
            for b in self.blocks[from_block : to_block + 1]
        ]
