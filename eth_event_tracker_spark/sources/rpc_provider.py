"""JSON-RPC HTTP provider — the live-node implementation of the Provider
surface (tracker.go:125-131: BlockNumber / GetBlockBy* / GetLogs / ChainID).

Speaks standard Ethereum JSON-RPC over HTTP (eth_chainId,
eth_getBlockByNumber, eth_getBlockByHash, eth_getLogs) with plain
urllib — no extra dependencies.  Two error behaviors matter to the engine:

  - the server's 10k-result cap surfaces as an RPC error object whose
    message the reference string-matches (tooMuchDataRequestedError,
    tracker.go:327-336); we raise :class:`TooMuchDataError` so the
    Tracker's AIMD loop halves the batch exactly as tracker.go:354-358.
  - every other RPC/transport error raises :class:`RpcError`; the Tracker
    retries the per-block head path 5×500 ms (tracker.go:806-811) and
    propagates bulk-path errors to the caller.

The same field mapping used by the file-backed source applies: hex
quantities → int, `data` hex → bytes, so rows are byte-identical no matter
which provider produced them.
"""

from __future__ import annotations

import json
import urllib.request

from .mock_chain import Header, TooMuchDataError

# the exact server message the reference string-matches (tracker.go:331-334)
TOO_MUCH_DATA_MESSAGE = "query returned more than 10000 results"


class RpcError(Exception):
    """Non-retryable-by-the-provider RPC error (code + message)."""

    def __init__(self, code: int, message: str) -> None:
        super().__init__(f"rpc error {code}: {message}")
        self.code = code
        self.message = message


def _hex(n: int) -> str:
    return hex(n)


def _to_int(h) -> int:
    return int(h, 16) if isinstance(h, str) else int(h)


def _to_header(obj: dict | None) -> Header | None:
    if obj is None:
        return None
    return Header(_to_int(obj["number"]), obj["hash"], obj["parentHash"])


def _to_log(obj: dict) -> dict:
    data = obj.get("data") or "0x"
    return {
        "log_index": _to_int(obj["logIndex"]),
        "tx_index": _to_int(obj["transactionIndex"]),
        "tx_hash": obj["transactionHash"],
        "block_num": _to_int(obj["blockNumber"]),
        "block_hash": obj["blockHash"],
        "address": obj["address"],
        "topics": list(obj.get("topics") or []),
        "data": bytes.fromhex(data[2:]) if data.startswith("0x") else bytes.fromhex(data),
    }


class JsonRpcProvider:
    """Provider over a JSON-RPC HTTP endpoint.

    Drop-in for MockProvider/FileChainReader anywhere the engine takes a
    provider: ``Tracker(JsonRpcProvider(url), store, config)``.
    """

    def __init__(self, url: str, timeout: float = 10.0) -> None:
        self.url = url
        self.timeout = timeout
        self._id = 0
        self._chain_id: int | None = None

    # -- transport ----------------------------------------------------------
    def _call(self, method: str, params: list):
        self._id += 1
        payload = json.dumps(
            {"jsonrpc": "2.0", "id": self._id, "method": method, "params": params}
        ).encode()
        req = urllib.request.Request(
            self.url, data=payload, headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            body = json.loads(resp.read())
        if "error" in body and body["error"] is not None:
            err = body["error"]
            msg = err.get("message", "")
            if msg == TOO_MUCH_DATA_MESSAGE:
                raise TooMuchDataError()
            raise RpcError(err.get("code", -1), msg)
        return body.get("result")

    # -- provider surface (tracker.go:125-131) ------------------------------
    @property
    def chain_id(self) -> int:
        if self._chain_id is None:
            self._chain_id = _to_int(self._call("eth_chainId", []))
        return self._chain_id

    def genesis_hash(self) -> str:
        blk = self._call("eth_getBlockByNumber", ["0x0", False])
        if blk is None:
            raise RpcError(-1, "node has no genesis block")
        return blk["hash"]

    def latest(self) -> Header:
        hdr = _to_header(self._call("eth_getBlockByNumber", ["latest", False]))
        if hdr is None:
            raise RpcError(-1, "node returned no latest block")
        return hdr

    def get_block_by_number(self, n: int) -> Header | None:
        return _to_header(self._call("eth_getBlockByNumber", [_hex(n), False]))

    def get_block_by_hash(self, h: str) -> Header | None:
        return _to_header(self._call("eth_getBlockByHash", [h, False]))

    def _topics_param(self, topics) -> list | None:
        # positional topics, None = wildcard (tracker.go:62-71 filter shape)
        return [t for t in topics] if topics else None

    def get_logs(self, from_block: int, to_block: int, addresses=(), topics=()) -> list[dict]:
        """S-1 — ranged eth_getLogs with the filter pushed server-side."""
        q: dict = {"fromBlock": _hex(from_block), "toBlock": _hex(to_block)}
        if addresses:
            q["address"] = list(addresses)
        t = self._topics_param(topics)
        if t is not None:
            q["topics"] = t
        return [_to_log(o) for o in self._call("eth_getLogs", [q]) or []]

    def get_logs_by_hash(self, block_hash: str, addresses=(), topics=()) -> list[dict]:
        """S-2 — fork-exact per-block eth_getLogs by blockHash."""
        q: dict = {"blockHash": block_hash}
        if addresses:
            q["address"] = list(addresses)
        t = self._topics_param(topics)
        if t is not None:
            q["topics"] = t
        return [_to_log(o) for o in self._call("eth_getLogs", [q]) or []]
