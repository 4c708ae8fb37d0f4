"""In-memory Store/Entry backend — the engine's twin of the reference's
inmem backend (store/inmem/inmem_store.go): same interface as
ParquetStore/ParquetEntry, list-backed, no durability.  Exists to prove
the store interface is pluggable (the reference runs one conformance
suite against inmem/bolt/pg — tests/test_store_conformance.py does the
same against parquet/inmem) and for fast unit composition."""

from __future__ import annotations


class InMemStore:
    def __init__(self) -> None:
        self._kv: dict[str, str] = {}
        self._entries: dict[str, InMemEntry] = {}

    # -- KV -----------------------------------------------------------------
    def get(self, key: str) -> str | None:
        return self._kv.get(key)

    def set(self, key: str, val: str) -> None:
        self._kv[key] = val

    def list_prefix(self, prefix: str) -> list[tuple[str, str]]:
        return sorted((k, v) for k, v in self._kv.items() if k.startswith(prefix))

    # -- entries ------------------------------------------------------------
    def entry(self, filter_hash: str, bucket_size: int = 10_000, schema=None) -> "InMemEntry":
        if filter_hash not in self._entries:
            self._entries[filter_hash] = InMemEntry()
        return self._entries[filter_hash]

    def changelog_entry(self, filter_hash: str, bucket_size: int = 10_000) -> "InMemEntry":
        return self.entry("changelog_" + filter_hash)


class InMemEntry:
    """Ordered, append-only, tail-truncatable log list
    (inmem_store.go:96-117 semantics)."""

    def __init__(self) -> None:
        self._rows: list[dict] = []

    def last_index(self) -> int:
        return len(self._rows)

    def store_logs(self, logs: list[dict]) -> list[dict]:
        base = len(self._rows)
        rows = [{**dict(lg), "indx": base + i} for i, lg in enumerate(logs)]
        self._rows.extend(rows)
        return rows

    def remove_logs(self, indx: int) -> None:
        del self._rows[indx:]

    def get_log(self, indx: int) -> dict | None:
        return self._rows[indx] if 0 <= indx < len(self._rows) else None

    def all_logs(self) -> list[dict]:
        return list(self._rows)

    def scan_tail(self, block_hashes: set[str]) -> list[dict]:
        victims: list[dict] = []
        for r in reversed(self._rows):
            if r["block_hash"] in block_hashes:
                victims.append(r)
            else:
                break
        victims.reverse()
        return victims

    def compact(self, bucket: int | None = None) -> int:
        return 0  # nothing to compact in memory

    def df(self, spark):
        from ..schemas import LOG_SCHEMA

        cols = [f.name for f in LOG_SCHEMA.fields]
        return spark.createDataFrame(
            [tuple(r.get(c) for c in cols) for r in self._rows], LOG_SCHEMA
        )
