"""Etherscan-style HTTP activity index — the fast-track probe's remote
client (fastTrack, tracker.go:446-519).

The reference asks an Etherscan-compatible API for each filter address's
first matching log (``module=logs&action=getLogs&fromBlock=0&toBlock=
latest``) and bulk-sync starts at the minimum across addresses
(tracker.go:500-509), skipping years of dead history.  This client
implements the same ``first_activity_block(address)`` surface the Tracker's
``activity_index`` hook consumes — plug it in as
``Tracker(..., activity_index=EtherscanActivityIndex(url, api_key))``.

Stdlib urllib only; block numbers parse as hex or decimal exactly like the
reference's parseUint64orHex.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request


def _parse_uint(v) -> int:
    """parseUint64orHex — etherscan returns hex ('0x1a') or decimal ('26')."""
    if isinstance(v, int):
        return v
    s = str(v)
    return int(s, 16) if s.startswith("0x") else int(s, 10)


class ActivityIndexError(Exception):
    """The index endpoint answered with an error status."""


class EtherscanActivityIndex:
    """First-activity probe over an Etherscan-compatible HTTP API."""

    def __init__(self, base_url: str, api_key: str | None = None, timeout: float = 10.0) -> None:
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.timeout = timeout

    def first_activity_block(self, address: str) -> int | None:
        """Block number of the address's first matching log, or None when
        the index has never seen it (the probe then falls back to a full
        scan for that address — min() across addresses still applies)."""
        params = {
            "module": "logs",
            "action": "getLogs",
            "address": address,
            "fromBlock": "0",
            "toBlock": "latest",
            # only the FIRST result matters — don't make the index page
            # through an active contract's whole history
            "page": "1",
            "offset": "1",
        }
        if self.api_key:
            params["apikey"] = self.api_key
        url = f"{self.base_url}/api?{urllib.parse.urlencode(params)}"
        with urllib.request.urlopen(url, timeout=self.timeout) as resp:
            body = json.loads(resp.read())
        # etherscan convention: status "0" + "No records found" is a valid
        # empty answer; any other status-0 (rate limit, bad key, …) is an
        # error the caller must see
        if body.get("status") == "0":
            if str(body.get("message", "")).lower().startswith("no records"):
                return None
            raise ActivityIndexError(str(body.get("message", "error")))
        result = body.get("result") or []
        if not result:
            return None
        return _parse_uint(result[0]["blockNumber"])
