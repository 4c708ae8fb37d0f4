"""Data-quality codec on the streaming sketch log: the expectation
suite's metrics ride the SAME exactly-once protocol as
CMS/HLL/Bloom/KMV/CDF.  Counts and decimal sums fold by exact cell-wise
decimal addition — build-path-independent like Bloom/CDF — so both the
metric STATE and the derived report pin bit-identical to a batch
``run_suite`` over the union of every ingested batch.
"""

from __future__ import annotations

import pytest

from eth_event_tracker_spark.operators import expectations as X
from eth_event_tracker_spark.streaming.sketch import (
    append_partial,
    compact_sketch,
    dq_codec,
    read_sketch,
    start_sketch_ingest,
)

SCHEMA = "id bigint, price double, code string"


def _checks():
    return [
        X.row_count(lo=1),
        X.completeness("id", 1.0),
        X.in_range("price", 0, 100, 0.9),
        X.matches("code", "^[A-Z]{2}$", 0.9),
        X.mean_between("price", 0.0, 100.0),
    ]


def _event_file(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "id": pa.array([r[0] for r in rows], pa.int64()),
                "price": pa.array([r[1] for r in rows], pa.float64()),
                "code": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        str(path),
    )


def _state(spark, path):
    sk = read_sketch(spark, str(path), codec=dq_codec(_checks()))
    return {r.metric: r.val for r in sk.collect()}


def _report_rows(df):
    return {
        r["check"]: (r["value"], r["passed"])
        for r in df.collect()
    }


BATCHES = [
    [(1, 10.0, "AA"), (2, 20.0, "AB"), (None, 30.0, "AC")],
    [(3, 150.0, "AD"), (4, 40.0, "a9"), (5, None, "AE")],
    [(6, 50.25, "AF")],
]


def test_dq_stream_bit_identical_to_batch_suite(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    all_rows = []
    for bi, rows in enumerate(BATCHES):
        _event_file(inp / f"b{bi}.parquet", rows)
        all_rows += rows
        q = start_sketch_ingest(
            spark,
            str(inp),
            None,
            str(tmp_path / "sk"),
            str(tmp_path / "ckpt"),
            schema=SCHEMA,
            available_now=True,
            codec=dq_codec(_checks()),
        )
        q.awaitTermination(120)
        assert q.exception() is None, q.exception()

    union = spark.createDataFrame(all_rows, SCHEMA)
    want_state = {
        r.metric: r.val
        for r in X.metrics_rows(union, _checks()).collect()
    }
    got_state = _state(spark, tmp_path / "sk")
    assert got_state == want_state, "stream metric state must equal one batch pass"

    # the derived report equals a batch run_suite over the union — every
    # expression is shared, so values AND verdicts are identical
    want = _report_rows(X.run_suite(union, _checks()))
    folded = read_sketch(spark, str(tmp_path / "sk"), codec=dq_codec(_checks()))
    got = _report_rows(X.report_from_metrics(folded, _checks()))
    assert got == want
    # sanity on the planted values: 7 rows, one NULL id, one out-of-range
    # price (150 of 6 non-null), one regex miss
    assert want["row_count"] == (7.0, True)
    assert want["completeness(id)"] == (6.0 / 7.0, False)
    assert want["in_range(price)"] == (5.0 / 6.0, False)
    assert want["matches(code)"] == (6.0 / 7.0, False)
    assert want["mean_between(price)"][0] == pytest.approx(300.25 / 6.0)

    # replayed batch id → exact no-op (watermark/durability protocol)
    append_partial(
        spark.createDataFrame(BATCHES[1], SCHEMA),
        1,
        str(tmp_path / "sk"),
        codec=dq_codec(_checks()),
    )
    assert _state(spark, tmp_path / "sk") == want_state

    # compaction folds the per-batch partials without changing the state
    compact_sketch(spark, str(tmp_path / "sk"), codec=dq_codec(_checks()))
    assert _state(spark, tmp_path / "sk") == want_state
    assert _report_rows(
        X.report_from_metrics(
            read_sketch(spark, str(tmp_path / "sk"), codec=dq_codec(_checks())),
            _checks(),
        )
    ) == want


def test_dq_codec_rejects_non_mergeable(spark):
    df = spark.createDataFrame([(1, 1.0, "AA")], SCHEMA)
    codec = dq_codec([X.distinctness("id")])
    with pytest.raises(ValueError, match="non-mergeable"):
        codec.build(df)


def test_dq_report_empty_log_fails_loudly(spark, tmp_path):
    """No batches ever ingested → every metric NULL → every check fails
    (an absent snapshot must not read as a passing contract)."""
    folded = read_sketch(spark, str(tmp_path / "sk_none"), codec=dq_codec(_checks()))
    rep = _report_rows(X.report_from_metrics(folded, _checks()))
    assert all(passed is False for (_v, passed) in rep.values())
