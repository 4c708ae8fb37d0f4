"""CDF/histogram codec on the streaming sketch log: the quantile
sketch rides the SAME exactly-once protocol as CMS/HLL/Bloom/KMV.
Counts are exact integers and the fold is cell-wise sum, so — like the
Bloom codec and unlike HLL — EVERY comparison pins bit-identical, even
across build paths (stream log vs one batch build over the union).
The sketch's error is read-time resolution only: cdf_quantiles returns
the bucket BRACKET [lo, hi] that provably contains the true quantile."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_event_tracker_spark.operators.sketches import cdf_histogram, cdf_quantiles
from eth_event_tracker_spark.streaming.sketch import (
    append_partial,
    cdf_codec,
    compact_sketch,
    read_sketch,
    start_sketch_ingest,
)

CUTS = [10.0, 50.0, 100.0, 500.0]
SCHEMA = "v double, key string"


def _codec():
    return cdf_codec(["key"], "v", CUTS, "key string")


def _event_file(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "v": pa.array([r[0] for r in rows], pa.float64()),
                "key": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(path),
    )


def _state(spark, path):
    sk = read_sketch(spark, str(path), codec=_codec())
    return {(r.key, r.bucket): r.cnt for r in sk.collect()}


def test_cdf_stream_bit_identical_to_batch_build(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    batches = [
        [(float(i % 700), f"k{i % 2}") for i in range(300)],
        [(float(i % 90), f"k{i % 3}") for i in range(300, 700)],
        [(None, "k0"), (5.0, "k1")],  # NULL counts in no bucket
    ]
    all_rows = []
    for bi, rows in enumerate(batches):
        _event_file(inp / f"b{bi}.parquet", rows)
        all_rows += rows
        q = start_sketch_ingest(
            spark, str(inp), None, str(tmp_path / "sk"), str(tmp_path / "ckpt"),
            schema=SCHEMA, available_now=True, codec=_codec(),
        )
        q.awaitTermination(120)
        assert q.exception() is None, q.exception()

    batch = cdf_histogram(
        spark.createDataFrame(all_rows, SCHEMA), ["key"], "v", CUTS
    )
    want = {(r.key, r.bucket): r.cnt for r in batch.collect()}
    got = _state(spark, tmp_path / "sk")
    assert got == want, "stream-accumulated counts must equal one batch build"
    assert sum(got.values()) == sum(1 for v, _ in all_rows if v is not None)

    # replayed batch id → exact no-op; compaction preserves the state
    df2 = spark.createDataFrame(batches[1], SCHEMA)
    append_partial(df2, 1, str(tmp_path / "sk"), codec=_codec())
    assert _state(spark, tmp_path / "sk") == want
    compact_sketch(spark, str(tmp_path / "sk"), codec=_codec())
    assert _state(spark, tmp_path / "sk") == want


def test_cdf_quantiles_bracket_exact_percentiles(spark):
    import math

    import numpy as np

    rows = [(float(v), "a") for v in range(1, 1000, 7)] + [
        (float(v * 3), "b") for v in range(1, 400, 3)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    hist = cdf_histogram(df, ["key"], "v", CUTS)
    qs = [0.25, 0.5, 0.9, 1.0]
    out = {
        (r.key, r.q): r for r in cdf_quantiles(hist, ["key"], CUTS, qs).collect()
    }
    for key in ("a", "b"):
        vals = np.sort([v for v, k in rows if k == key])
        n = len(vals)
        for q in qs:
            r = out[(key, q)]
            assert r.n == n
            # the ceil(q*n)-th order statistic
            true_q = vals[math.ceil(q * n) - 1]
            lo = r.lo if r.lo is not None else float("-inf")
            hi = r.hi if r.hi is not None else float("inf")
            assert lo <= true_q <= hi, (key, q, true_q, r)


def test_cdf_quantiles_open_ends_and_determinism(spark):
    rows = [(1.0, "x"), (2.0, "x"), (9999.0, "x")]
    hist = cdf_histogram(spark.createDataFrame(rows, SCHEMA), ["key"], "v", CUTS)
    out = {r.q: r for r in cdf_quantiles(hist, ["key"], CUTS, [0.5, 1.0]).collect()}
    assert out[0.5].lo is None and out[0.5].hi == 10.0  # bottom bucket
    assert out[1.0].lo == 500.0 and out[1.0].hi is None  # open top bucket

    df = spark.createDataFrame(
        [(float(i % 777), f"k{i % 5}") for i in range(2000)], SCHEMA
    )
    a = sorted(map(tuple, cdf_histogram(df, ["key"], "v", CUTS).collect()))
    b = sorted(map(tuple, cdf_histogram(df.repartition(17), ["key"], "v", CUTS).collect()))
    assert a == b
