"""Ordering / indexing operators — the reference's S-5..S-8 store semantics.

The reference assigns a monotonic per-filter `indx` at store time by
serializing through LastIndex() (postgresql_store.go:111-130,
boltdb/bolt_store.go:159-166).  A global counter fights parallelism; the
Spark-native equivalent is the deterministic ordering key
(block_num, tx_index, log_index) + row_number, plus a carried base offset
across micro-batches (micro-batches are sequential, so this is exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Canonical intra-filter ordering (the order StoreLogs appends in,
# tracker.go:338-400: ranges scan forward; within a block, tx then log pos).
ORDER_COLS = ("block_num", "tx_index", "log_index")


def assign_indx(df: DataFrame, base: int = 0, partition_cols: tuple[str, ...] = ()) -> DataFrame:
    """S-5 — assign consecutive `indx` starting at ``base`` (= LastIndex()
    of the target entry), ordered by the canonical key.

    Scale note: an unpartitioned row_number is a single-reducer sort — fine
    per micro-batch (bounded by AIMD batch size), wrong for a 100 TB
    backfill.  For bulk backfills pass ``partition_cols=("filter_hash",)``
    so each filter's sequence is its own partition, or use
    ``assign_indx_scalable`` for a two-phase global sequence."""
    w = (
        Window.partitionBy(*[F.col(c) for c in partition_cols])
        if partition_cols
        else Window.partitionBy()
    ).orderBy(*[F.col(c) for c in ORDER_COLS])
    return df.withColumn("indx", (F.row_number().over(w) - 1 + F.lit(base)).cast("long"))


def assign_indx_scalable(df: DataFrame, base: int = 0) -> DataFrame:
    """Two-phase global sequence without a single-reducer sort:
    range-partition by the ordering key, row_number within partition, then
    add per-partition cumulative offsets (computed from partition counts —
    a tiny driver-side aggregate, not a second shuffle of the data).

    Equivalent result to ``assign_indx`` but each of the N partitions sorts
    only its slice — the plan a 1000-executor backfill needs."""
    parts = df.repartitionByRange(*[F.col(c) for c in ORDER_COLS])
    with_pid = parts.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in ORDER_COLS])
    numbered = with_pid.withColumn("_rn", F.row_number().over(w))
    # offsets: cumulative count of earlier partitions (partition ids are
    # ordered by range boundaries, so pid order == key order)
    counts = numbered.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)))
    return (
        numbered.join(F.broadcast(offsets.select("_pid", "_off")), "_pid")
        .withColumn("indx", (F.col("_rn") - 1 + F.col("_off") + F.lit(base)).cast("long"))
        .drop("_pid", "_rn", "_off")
    )


def last_index(df: DataFrame) -> DataFrame:
    """S-8 — LastIndex() = 1 + max(indx); the reference implements it as a
    reverse cursor / ORDER BY indx DESC LIMIT 1 (bolt_store.go:132-144,
    postgresql_store.go:98-107) — i.e. top-1 sort ≡ max().  Spark's
    max() aggregate is partial+final (map-side combine), no full sort."""
    return df.agg((F.coalesce(F.max("indx"), F.lit(-1)) + 1).alias("last_index"))


def point_lookup(df: DataFrame, indx: int) -> DataFrame:
    """S-7 — GetLog(indx) (store/store.go:34-35).  An equality predicate on
    the sort/partition key: parquet row-group min-max stats skip everything
    else."""
    return df.where(F.col("indx") == F.lit(indx))


def tail_truncate_predicate(n: int, hash_at_n: str | None):
    """A-2 — the set removed by a rollback to (n, hash): all logs with
    block_num > n, or at height n with a different block hash
    (removeLogs, tracker.go:717-754).  The Go reverse-walk is an index-scan
    trick; relationally it is just this predicate."""
    pred = F.col("block_num") > F.lit(n)
    if hash_at_n is not None:
        pred = pred | ((F.col("block_num") == F.lit(n)) & (F.col("block_hash") != F.lit(hash_at_n)))
    return pred


def removed_logs(df: DataFrame, n: int, hash_at_n: str | None) -> DataFrame:
    """A-2 + A-3 — the retraction set, emitted oldest-first
    (revertLogs flips the walk order, tracker.go:756-761)."""
    return df.where(tail_truncate_predicate(n, hash_at_n)).orderBy(*ORDER_COLS)


def checkpoint_resume(df: DataFrame, last_block: int) -> DataFrame:
    """O-3 — never re-scan at or below the checkpoint (tracker.go:611-666):
    the resumed scan starts at last_block + 1.  On a partitioned table this
    is partition pruning, not a filter."""
    return df.where(F.col("block_num") > F.lit(last_block))
