"""Direct tests of the indx-assignment operators (S-5..S-8 semantics):
the offset-pruned point lookup must agree with the full two-phase
numbering at every position, including duplicate ordering keys and
irregular per-block log counts."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from eth_event_tracker_spark.operators.indexing import (
    assign_indx_scalable,
    point_lookup_seq,
)


def _random_logs(spark, seed: int, n_blocks: int = 40):
    """Irregular chain shard: blocks with 0-7 logs, repeated (tx, log)
    positions allowed (ordering must still be total and deterministic
    because row_number ties break identically in both plans only when
    the key is unique — so generate unique keys per block)."""
    rng = random.Random(seed)
    rows = []
    for b in range(n_blocks):
        per = rng.randint(0, 7)
        keys = rng.sample([(t, lg) for t in range(5) for lg in range(3)], per)
        for t, lg in keys:
            rows.append((b, t, lg, f"0x{seed:02x}{b:04x}{t}{lg}"))
    return spark.createDataFrame(
        rows, "block_num long, tx_index long, log_index long, tx_hash string"
    )


def test_point_lookup_seq_matches_full_numbering(spark):
    for seed in (7, 23):
        df = _random_logs(spark, seed)
        full = {
            r.indx: r.tx_hash
            for r in assign_indx_scalable(df).select("indx", "tx_hash").collect()
        }
        n = len(full)
        assert sorted(full) == list(range(n)), "numbering must be gapless from 0"
        # probe start, end, block boundaries, and random interior positions
        probes = {0, n - 1, n // 2} | {random.Random(seed).randrange(n) for _ in range(5)}
        for i in probes:
            got = point_lookup_seq(df, i).select("indx", "tx_hash").collect()
            assert len(got) == 1
            assert (got[0].indx, got[0].tx_hash) == (i, full[i])


def test_point_lookup_seq_with_base_offset(spark):
    df = _random_logs(spark, 5)
    n = assign_indx_scalable(df).count()
    base = 1000
    full = {
        r.indx: r.tx_hash
        for r in assign_indx_scalable(df, base=base).select("indx", "tx_hash").collect()
    }
    for i in (base, base + n // 3, base + n - 1):
        got = point_lookup_seq(df, i, base=base).collect()
        assert len(got) == 1 and got[0].indx == i and got[0].tx_hash == full[i]


def test_point_lookup_seq_out_of_range_is_empty(spark):
    df = _random_logs(spark, 9)
    n = assign_indx_scalable(df).count()
    assert point_lookup_seq(df, n).count() == 0  # one past the end
    assert point_lookup_seq(df, n + 100).count() == 0


def test_point_lookup_seq_prunes_to_one_block(spark):
    """The scale property: the window in the pruned plan partitions a
    single block — the executed plan must not number the whole table
    (no join of the full offsets table into the fact side)."""
    df = _random_logs(spark, 11)
    plan = point_lookup_seq(df, 3)._jdf.queryExecution().executedPlan().toString()
    # the fact side meets a broadcast *limit-1* target, not the offsets table
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan
