"""HLL codec over the streaming sketch log: the distinct-count sketch
rides the SAME exactly-once protocol as the CMS (durability markers,
replay watermark, ingest lock, compaction swap) — only build/fold
differ.

What is pinned EXACTLY vs within-bound (measured, not assumed):
DataSketches HLL serialization is merge-tree-dependent — the same rows
built under different partitioning give byte-different sketches, and
the union estimator is path-dependent (union-of-1 keeps the HIP
estimator; union-of->=2 falls back to the composite estimate, which is
then exactly stable).  So cross-build-path comparisons (stream log vs
independently built batch profiles) are pinned within ~1 sigma of each
other and of the truth; SAME-path comparisons (replay, compaction,
duplicated batch on the >=2-union path) are pinned exactly — that is
the idempotence bonus HLL adds over the CMS: even a DOUBLE-counted
batch cannot change the merged state."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from eth_event_tracker_spark.operators.sketches import hll_merge_profiles, hll_profile
from eth_event_tracker_spark.streaming.sketch import (
    append_partial,
    compact_sketch,
    hll_codec,
    read_sketch,
    start_sketch_ingest,
)

CODEC_KW = dict(keys=["key"], col="event_id", key_schema="key string", lgk=12)


def _event_file(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "key": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, str(path))


def _estimates(spark, path, codec):
    sk = read_sketch(spark, str(path), codec=codec)
    return {
        r.key: r.est
        for r in sk.select("key", F.hll_sketch_estimate("sketch").alias("est")).collect()
    }


def test_hll_stream_equals_batch_union_and_survives_replay(spark, tmp_path):
    codec = hll_codec(**CODEC_KW)
    inp = tmp_path / "in"
    inp.mkdir()
    batches = [
        [(i, f"k{i % 3}") for i in range(0, 400)],
        [(i, f"k{i % 3}") for i in range(200, 900)],  # overlaps batch 0
        [(i, f"k{i % 5}") for i in range(900, 1500)],
    ]
    all_rows = []

    def run():
        q = start_sketch_ingest(
            spark, str(inp), None, str(tmp_path / "sk"), str(tmp_path / "ckpt"),
            schema="event_id long, key string", available_now=True, codec=codec,
        )
        q.awaitTermination(120)
        assert q.exception() is None, q.exception()

    for bi, rows in enumerate(batches):
        _event_file(inp / f"b{bi}.parquet", rows)
        all_rows += rows
        run()

    # cross-build-path: the batch-side merge of independently built
    # per-batch profiles agrees within ~1 sigma (sketch bytes are
    # merge-tree-dependent, so exact equality across build paths is not
    # a property HLL has — see module docstring)
    profs = [
        hll_profile(spark.createDataFrame(rows, "event_id long, key string"), ["key"], "event_id")
        for rows in batches
    ]
    want = {
        r.key: r.n_distinct_est
        for r in hll_merge_profiles(*profs, keys=["key"]).collect()
    }
    got = _estimates(spark, tmp_path / "sk", codec)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) <= max(2, 0.02 * want[k]), (k, got[k], want[k])

    # truth within the lgk=12 bound (overlap must not double count)
    truth = {}
    for eid, k in all_rows:
        truth.setdefault(k, set()).add(eid)
    for k, ids in truth.items():
        assert abs(got[k] - len(ids)) <= max(2, 0.04 * len(ids)), (k, got[k], len(ids))

    # checkpoint replay with no new data: no-op
    run()
    assert _estimates(spark, tmp_path / "sk", codec) == got

    # compaction folds to one part, state unchanged
    compact_sketch(spark, str(tmp_path / "sk"), codec=codec)
    assert _estimates(spark, tmp_path / "sk", codec) == got
    part_dirs = [
        d for d in os.listdir(tmp_path / "sk" / "parts") if d.startswith("batch=")
    ]
    assert part_dirs == ["batch=-1"]

    # replay AFTER compaction: the batch dirs are gone, the watermark
    # says skip — still unchanged
    run()
    assert _estimates(spark, tmp_path / "sk", codec) == got


def test_hll_append_is_idempotent_even_without_markers(spark, tmp_path):
    """Belt and braces the CMS can't offer: force the same rows through
    EXTRA batch ids (a true double count for a counter sketch) — HLL
    register max is idempotent, so once the fold is on the >=2-sketch
    union path the estimate cannot move no matter how many duplicate
    batches land.  (The 1->2 read CAN move by ~1 sigma: union-of-1
    keeps the HIP estimator, union-of->=2 is the composite estimate —
    the registers are what is idempotent, and the composite estimate
    over them is pinned exactly stable below.)"""
    codec = hll_codec(**CODEC_KW)
    df = spark.createDataFrame([(i, "a") for i in range(1000)], "event_id long, key string")
    append_partial(df, 0, str(tmp_path / "sk"), codec=codec)
    one = _estimates(spark, tmp_path / "sk", codec)
    assert abs(one["a"] - 1000) <= 0.04 * 1000
    append_partial(df, 1, str(tmp_path / "sk"), codec=codec)
    two = _estimates(spark, tmp_path / "sk", codec)
    assert abs(two["a"] - 1000) <= 0.04 * 1000
    append_partial(df, 2, str(tmp_path / "sk"), codec=codec)
    assert _estimates(spark, tmp_path / "sk", codec) == two  # exact


def test_hll_empty_log_reads_with_schema(spark, tmp_path):
    codec = hll_codec(**CODEC_KW)
    sk = read_sketch(spark, str(tmp_path / "nothing"), codec=codec)
    assert sk.columns == ["key", "sketch"] and sk.count() == 0


def test_append_requires_key_or_codec(spark, tmp_path):
    import pytest

    df = spark.createDataFrame([(1, "a")], "event_id long, key string")
    with pytest.raises(ValueError):
        append_partial(df, 0, str(tmp_path / "sk"))


# ---------------------------------------------------------------------------
# KMV codec — deterministic, so (unlike HLL above) EVERY pin is exact
# ---------------------------------------------------------------------------
def test_kmv_stream_equals_batch_profile_exactly(spark, tmp_path):
    from eth_event_tracker_spark.operators.sketches import kmv_estimate, kmv_profile
    from eth_event_tracker_spark.streaming.sketch import compact_sketch, kmv_codec

    codec = kmv_codec(["key"], "event_id", "key string", k=64)
    inp = tmp_path / "in"
    inp.mkdir()
    batches = [
        [(i, f"k{i % 3}") for i in range(0, 400)],
        [(i, f"k{i % 3}") for i in range(200, 900)],
        [(i, f"k{i % 5}") for i in range(900, 1500)],
    ]
    all_rows = []

    def run():
        q = start_sketch_ingest(
            spark, str(inp), None, str(tmp_path / "sk"), str(tmp_path / "ckpt"),
            schema="event_id long, key string", available_now=True, codec=codec,
        )
        q.awaitTermination(120)
        assert q.exception() is None, q.exception()

    for bi, rows in enumerate(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table({
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "key": pa.array([r[1] for r in rows], pa.string()),
            }),
            str(inp / f"b{bi}.parquet"),
        )
        all_rows += rows
        run()

    whole = spark.createDataFrame(all_rows, "event_id long, key string")
    want = {(r.key, r.h) for r in kmv_profile(whole, ["key"], "event_id", k=64).collect()}
    state = lambda: {
        (r.key, r.h) for r in read_sketch(spark, str(tmp_path / "sk"), codec=codec).collect()
    }
    assert state() == want  # EXACT: bottom-k of union is deterministic

    run()  # replay: no-op
    assert state() == want
    compact_sketch(spark, str(tmp_path / "sk"), codec=codec)
    assert state() == want

    # and the estimates ride along: union truth within 1/sqrt(k-2)
    est = {
        r.key: r.n_distinct_est
        for r in kmv_estimate(
            read_sketch(spark, str(tmp_path / "sk"), codec=codec), ["key"], k=64
        ).collect()
    }
    truth = {}
    for eid, kk in all_rows:
        truth.setdefault(kk, set()).add(eid)
    for kk, ids in truth.items():
        assert abs(est[kk] - len(ids)) <= max(3, 0.45 * len(ids)), (kk, est[kk], len(ids))
