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
    (d / "meta.json").write_text(
        json.dumps({"chain_id": provider.chain_id, "genesis": provider.genesis_hash()})
    )


class FileChainReader:
    """Task-side reader of a dumped chain."""

    def __init__(self, chain_dir: str) -> None:
        self.dir = Path(chain_dir)
        self._blocks: list[dict] | None = None

    @property
    def blocks(self) -> list[dict]:
        if self._blocks is None:
            with (self.dir / "blocks.jsonl").open() as f:
                self._blocks = [json.loads(line) for line in f if line.strip()]
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
