"""eth_event_tracker_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of umbracle/eth-event-tracker.

The reference (`/root/reference/`) is an incremental, reorg-aware ETL
pipeline syncing Ethereum contract event logs into an ordered store and
emitting an Added/Removed changelog. This package re-expresses those
semantics Spark-first:

- ``config``     — FilterConfig + sha-256 filter identity (tracker.go:47-60)
- ``schemas``    — fixed StructTypes for logs/blocks/kv (postgresql_store.go:208-239)
- ``tables``     — fixture loaders + deterministic derived chain tables
- ``operators``  — filters, indexing, reorg reconcile, dedup, similarity, text
- ``sources``    — mock RPC provider + Python data source for micro-batch log scan
- ``store``      — parquet-backed ordered entry store (append / tail-truncate)
- ``streaming``  — the tracker as a Structured-Streaming-style incremental job
- ``functions``  — scalar helpers (hex, ABI little-endian decode, portable hash)
"""

__version__ = "0.1.0"
