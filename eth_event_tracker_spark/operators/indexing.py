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
    """Two-phase global sequence without a single-reducer sort: per-block
    cumulative offsets + row_number within block.

    Phase 1 aggregates log counts per block (map-side combine; output is
    ~#blocks rows, orders of magnitude smaller than the log table) and
    turns them into cumulative start offsets.  Phase 2 joins the offsets
    back and numbers rows within each block — a window partitioned by
    block_num, so every partition sorts only one block's logs.  The fact
    table moves through exactly one hash shuffle on block_num, which the
    join and the window share.

    Unlike a spark_partition_id() formulation (range-partition + offset
    by physical partition), the offsets here key on DATA VALUES, so the
    result is deterministic across re-evaluations — repartitionByRange's
    sampled boundaries and AQE's runtime coalescing can differ between
    the two branches of a self-join and silently corrupt or drop rows
    (observed at sf0.1: 12k of 100k rows survived the _pid join).

    The cumulative window over the per-block counts is a single partition
    of tiny rows; if #blocks itself ever became huge, the same two-phase
    trick applies recursively on block ranges."""
    blk, *within = ORDER_COLS
    per_block = df.groupBy(blk).agg(F.count("*").alias("_cnt"))
    w_off = Window.orderBy(blk).rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_block.select(
        blk, F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = Window.partitionBy(blk).orderBy(*[F.col(c) for c in within])
    return (
        df.join(offsets, blk)
        .withColumn("indx", (F.row_number().over(w_in) - 1 + F.col("_off") + F.lit(base)).cast("long"))
        .drop("_off")
    )


def point_lookup_seq(df: DataFrame, indx: int, base: int = 0) -> DataFrame:
    """S-7 GetLog(indx) over the *derived* sequence (no physical indx
    column) without numbering the whole table.

    assign_indx_scalable + filter is semantically right but touches every
    row with a join + full window shuffle to keep one.  Since indx is
    cumulative in block order, the block containing ``indx`` is decidable
    from the per-block offsets alone (tiny table): find the last block
    whose start offset <= indx, broadcast that single row back, and
    number only that block's logs.  The fact table is touched by one
    map-side-combine count agg and one broadcast-pruned pass — at 100 TB
    the window sorts one block, not the corpus."""
    blk, *within = ORDER_COLS
    per_block = df.groupBy(blk).agg(F.count("*").alias("_cnt"))
    w_off = Window.orderBy(blk).rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_block.select(
        blk, F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off")
    )
    target = offsets.where(F.col("_off") <= F.lit(indx - base)).orderBy(F.col(blk).desc()).limit(1)
    w_in = Window.partitionBy(blk).orderBy(*[F.col(c) for c in within])
    return (
        df.join(F.broadcast(target), blk)
        .withColumn("indx", (F.row_number().over(w_in) - 1 + F.col("_off") + F.lit(base)).cast("long"))
        .where(F.col("indx") == F.lit(indx))
        .drop("_off")
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
