"""Fixed schemas of the engine's chain-data model.

The reference's authoritative flattened log schema is the PostgreSQL row
object at /root/reference/store/postgresql/postgresql_store.go:208-217 and
its DDL at :226-239 (`indx, tx_index, tx_hash, block_num, block_hash,
address, topics, data`).  The reference stores everything stringly
(hex/CSV-in-a-cell); here each column gets a native Spark type.

Block headers: the reference touches Number/Hash/ParentHash/Difficulty of
web3.Block (tracker.go:237-247, 291-314, 627).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# The event-log fact row (postgresql_store.go:208-217).
LOG_SCHEMA = StructType(
    [
        StructField("indx", LongType(), False),  # per-filter monotonic sequence (postgresql_store.go:111-130)
        StructField("log_index", LongType(), True),  # position within block
        StructField("tx_index", LongType(), True),  # transaction position within block
        StructField("tx_hash", StringType(), True),  # 0x + 64 hex
        StructField("block_num", LongType(), False),
        StructField("block_hash", StringType(), False),  # fork identity (tracker.go:735)
        StructField("address", StringType(), True),  # emitting contract, 0x + 40 hex
        StructField("topics", ArrayType(StringType()), True),  # positional, topic[0] = event sig
        StructField("data", BinaryType(), True),  # ABI-encoded non-indexed params
    ]
)

# Raw log as delivered by the source (before indx assignment).
RAW_LOG_SCHEMA = StructType([f for f in LOG_SCHEMA.fields if f.name != "indx"])

# Changelog stream row: a log plus its Added/Removed action — the
# readStream-native form of the reference's Event{Added,Removed} stream
# (tracker.go:763-829), emitted by sources/changelog_source.py.
CHANGELOG_STREAM_SCHEMA = StructType(
    [StructField("action", StringType(), False), *RAW_LOG_SCHEMA.fields]
)

# Chain headers incl. fork branches (web3.Block usage, tracker.go:237-247).
BLOCK_SCHEMA = StructType(
    [
        StructField("block_num", LongType(), False),
        StructField("block_hash", StringType(), False),
        StructField("parent_hash", StringType(), True),
        StructField("difficulty", LongType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

# KV metadata rows (postgresql_store.go:219-224; keys at tracker.go:26-31).
KV_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("val", StringType(), True),
    ]
)

# Changelog row: a log tagged with its change type. The reference delivers
# Event{Added, Removed []*Log} (tracker.go:841-846); rows tagged
# change_type ∈ {add, remove} are the Spark-native equivalent.
CHANGELOG_SCHEMA = StructType(
    [StructField("change_type", StringType(), False)] + list(LOG_SCHEMA.fields)
)

# Filter spec rows (FilterConfig, tracker.go:38-45).
FILTER_SCHEMA = StructType(
    [
        StructField("filter_hash", StringType(), False),
        StructField("addresses", ArrayType(StringType()), True),
        StructField("topics", ArrayType(StringType()), True),  # null element = wildcard
        StructField("start_block", LongType(), True),
    ]
)

MULTIMODAL_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),  # opaque encoded bytes
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)
