"""Bloom codec over the streaming sketch log: the third sketch on the
exactly-once protocol (CMS frequencies, HLL distinct counts, Bloom
membership).  Bloom's fold (per-word bit OR) is associative, idempotent
AND exactly build-path-independent, so — unlike HLL — EVERY comparison
here is exact: stream-accumulated state is bit-identical to a batch
build over the union of all rows, replay/compaction/duplicate batches
are exact no-ops, and membership has no false negatives."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from eth_event_tracker_spark.operators.bloom import bloom_rows, bloom_rows_member
from eth_event_tracker_spark.streaming.sketch import (
    append_partial,
    bloom_codec,
    compact_sketch,
    read_sketch,
    start_sketch_ingest,
)


def _doc_file(path, ids):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"key": pa.array([f"doc{i}" for i in ids], pa.string())}), str(path)
    )


def _state(spark, path, codec):
    return {
        (r.word, r.bits) for r in read_sketch(spark, str(path), codec=codec).collect()
    }


def test_bloom_stream_equals_batch_build_exactly(spark, tmp_path):
    codec = bloom_codec("key")
    inp = tmp_path / "in"
    inp.mkdir()
    batches = [range(0, 400), range(200, 900), range(900, 1500)]  # overlap
    seen = set()

    def run():
        q = start_sketch_ingest(
            spark, str(inp), None, str(tmp_path / "sk"), str(tmp_path / "ckpt"),
            schema="key string", available_now=True, codec=codec,
        )
        q.awaitTermination(120)
        assert q.exception() is None, q.exception()

    for bi, ids in enumerate(batches):
        _doc_file(inp / f"b{bi}.parquet", ids)
        seen |= set(ids)
        run()

    whole = spark.createDataFrame([(f"doc{i}",) for i in sorted(seen)], "key string")
    want = {(r.word, r.bits) for r in bloom_rows(whole, "key").collect()}
    got = _state(spark, tmp_path / "sk", codec)
    assert got == want  # EXACT — no merge-tree dependence

    # replay with no new data, then compaction, then replay again: all exact no-ops
    run()
    assert _state(spark, tmp_path / "sk", codec) == want
    compact_sketch(spark, str(tmp_path / "sk"), codec=codec)
    assert _state(spark, tmp_path / "sk", codec) == want
    parts = [d for d in os.listdir(tmp_path / "sk" / "parts") if d.startswith("batch=")]
    assert parts == ["batch=-1"]
    run()
    assert _state(spark, tmp_path / "sk", codec) == want

    # membership over the folded state: every ingested key positive (no
    # false negatives), fresh keys essentially all negative at this sizing
    sk = read_sketch(spark, str(tmp_path / "sk"), codec=codec)
    members = bloom_rows_member(sk, whole, "key").collect()
    assert all(r.maybe_member for r in members) and len(members) == len(seen)
    fresh = spark.createDataFrame([(f"new{i}",) for i in range(1000)], "key string")
    fps = [r.key for r in bloom_rows_member(sk, fresh, "key").collect() if r.maybe_member]
    assert len(fps) <= 2, fps


def test_bloom_duplicate_batch_append_is_exact_noop(spark, tmp_path):
    codec = bloom_codec("key")
    df = spark.createDataFrame([(f"doc{i}",) for i in range(800)], "key string")
    append_partial(df, 0, str(tmp_path / "sk"), codec=codec)
    one = _state(spark, tmp_path / "sk", codec)
    append_partial(df, 1, str(tmp_path / "sk"), codec=codec)  # true double count
    assert _state(spark, tmp_path / "sk", codec) == one  # OR is idempotent, exactly


def test_bloom_empty_log_reads_with_schema(spark, tmp_path):
    codec = bloom_codec("key")
    sk = read_sketch(spark, str(tmp_path / "none"), codec=codec)
    assert sk.columns == ["word", "bits"] and sk.count() == 0
