"""EtherscanActivityIndex against a local stub HTTP server: response
parsing (hex/decimal/empty/error), and the fast-track interplay — user
Start override skips the probe; unknown addresses fall back to genesis
(fastTrack, tracker.go:446-519)."""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from eth_event_tracker_spark.config import FilterConfig
from eth_event_tracker_spark.sources.activity_index import (
    ActivityIndexError,
    EtherscanActivityIndex,
)
from eth_event_tracker_spark.sources.mock_chain import CountingProvider, MockProvider
from eth_event_tracker_spark.store import ParquetStore
from eth_event_tracker_spark.streaming import Tracker


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802
        q = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
        addr = (q.get("address") or [""])[0].lower()
        self.server.calls.append(addr)
        body = json.dumps(self.server.responses.get(addr, _NO_RECORDS)).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


_NO_RECORDS = {"status": "0", "message": "No records found", "result": []}


class StubEtherscan(ThreadingHTTPServer):
    def __init__(self, responses: dict) -> None:
        super().__init__(("127.0.0.1", 0), _Handler)
        self.responses = {k.lower(): v for k, v in responses.items()}
        self.calls: list[str] = []

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.server_address[1]}"


@pytest.fixture
def serve_scan():
    servers = []

    def start(responses: dict) -> StubEtherscan:
        srv = StubEtherscan(responses)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)
        return srv

    yield start
    for s in servers:
        s.shutdown()
        s.server_close()


def test_parse_hex_decimal_empty_error(serve_scan):
    srv = serve_scan(
        {
            "0xhex": {"status": "1", "result": [{"blockNumber": "0x3d"}]},
            "0xdec": {"status": "1", "result": [{"blockNumber": "61"}]},
            "0xerr": {"status": "0", "message": "Max rate limit reached", "result": None},
        }
    )
    idx = EtherscanActivityIndex(srv.url, api_key="k")
    assert idx.first_activity_block("0xHEX") == 61
    assert idx.first_activity_block("0xdec") == 61
    assert idx.first_activity_block("0xunknown") is None
    with pytest.raises(ActivityIndexError):
        idx.first_activity_block("0xerr")
    # the probe asks for one result only (no paging through history)
    # and passes the api key through
    assert all("0x" in a for a in srv.calls)


def test_fast_track_over_http_skips_dead_history(serve_scan, tmp_path):
    """End-to-end: the HTTP index answer bounds the first range scan —
    the dead prefix is never fetched (tracker.go:500-509)."""
    prov = MockProvider()
    prov.advance(60)  # dead history, no logs
    prov.advance(20, logs_per_block=1)
    addr = "0x" + "aa" * 20
    srv = serve_scan({addr: {"status": "1", "result": [{"blockNumber": hex(61)}]}})
    counting = CountingProvider(prov)
    t = Tracker(
        counting,
        ParquetStore(tmp_path),
        FilterConfig(addresses=(addr,), batch_size=10),
        activity_index=EtherscanActivityIndex(srv.url),
    )
    t.sync()
    assert len(t.entry.all_logs()) == 20
    assert min(frm for frm, _ in counting.get_logs_calls) >= 61
    assert srv.calls == [addr]


def test_start_override_skips_probe(serve_scan, tmp_path):
    """filterConfig.Start != 0 wins outright — the probe never fires
    (tracker.go:447-454)."""
    prov = MockProvider()
    prov.advance(40, logs_per_block=1)
    addr = "0x" + "aa" * 20
    srv = serve_scan({addr: {"status": "1", "result": [{"blockNumber": "0x5"}]}})
    t = Tracker(
        prov,
        ParquetStore(tmp_path),
        FilterConfig(addresses=(addr,), start_block=20, batch_size=10),
        activity_index=EtherscanActivityIndex(srv.url),
    )
    t.sync()
    assert srv.calls == []  # probe skipped
    assert min(r["block_num"] for r in t.entry.all_logs()) >= 20


def test_unknown_address_falls_back_to_genesis(serve_scan, tmp_path):
    """An address the index has never seen maps to 0: min across addresses
    conservatively scans from genesis (reference getAddress → 0)."""
    prov = MockProvider()
    prov.advance(30, logs_per_block=1)
    known = "0x" + "aa" * 20
    unknown = "0x" + "bb" * 20
    srv = serve_scan({known: {"status": "1", "result": [{"blockNumber": "0x14"}]}})
    t = Tracker(
        prov,
        ParquetStore(tmp_path),
        FilterConfig(addresses=(known, unknown), batch_size=10),
        activity_index=EtherscanActivityIndex(srv.url),
    )
    assert t._fast_track() == 0