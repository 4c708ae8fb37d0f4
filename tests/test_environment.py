"""Runtime-compatibility guard.

Round 3 lesson: PySpark 4.x changed how TIMESTAMP(NANOS) parquet reads
back (bigint-nanos → TIMESTAMP_NTZ), which silently disabled the fixture
loader's compat branch and broke every watermarked streaming operator
three tests downstream of the root cause.  These tests pin the contract
at the source so a future runtime change produces ONE failure naming the
root cause:

  1. ``load_table`` must surface events.ts as TimestampType (LTZ);
  2. ``withWatermark`` must accept that schema on a streaming relation;
  3. ``normalize_event_ts`` must map BOTH on-disk encodings the loader
     can encounter (bigint nanos on <=3.5 runtimes, TIMESTAMP_NTZ on
     4.x) to identical TimestampType values;
  4. the normalized values must equal DuckDB's read of the same parquet
     (the oracle the driver hashes against).

Tested runtimes: PySpark 3.5 (bigint branch, by synthetic fixture) and
PySpark 4.1.2 (NTZ branch, natively) — see README "Runtime".
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType, TimestampNTZType, TimestampType

from eth_event_tracker_spark.tables import load_table, normalize_event_ts


def test_events_ts_loads_as_timestamp_ltz(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType), (
        f"events.ts must load as TimestampType (LTZ); got {ev.schema['ts'].dataType}. "
        "Watermarked streaming operators require LTZ — fix tables.normalize_event_ts "
        "for this runtime before debugging downstream streaming failures."
    )


def test_watermark_accepts_loaded_events_schema(spark, sf_dir, tmp_path):
    """The exact construction every streaming test uses: restage the loaded
    events, readStream with its schema, withWatermark.  On a bad runtime
    this throws EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE right here."""
    ev = load_table(spark, sf_dir, "events").limit(10)
    d = str(tmp_path / "staged")
    ev.write.parquet(d)
    stream = spark.readStream.schema(ev.schema).parquet(d)
    wm = stream.withWatermark("ts", "10 minutes")  # must not raise
    assert wm.isStreaming


@pytest.mark.parametrize("encoding", ["bigint_nanos", "timestamp_ntz"])
def test_normalize_event_ts_both_encodings(spark, encoding):
    """Both on-disk encodings normalize to the same TimestampType instants."""
    base_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in micros
    rows_us = [base_us + i * 61_000_003 for i in range(5)]
    if encoding == "bigint_nanos":
        schema = StructType([StructField("event_id", LongType()), StructField("ts", LongType())])
        df = spark.createDataFrame([(i, us * 1000) for i, us in enumerate(rows_us)], schema)
    else:
        schema = StructType(
            [StructField("event_id", LongType()), StructField("ts", TimestampNTZType())]
        )
        df = spark.createDataFrame(
            [
                (i, datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=us))
                for i, us in enumerate(rows_us)
            ],
            schema,
        )
    out = normalize_event_ts(df)
    assert isinstance(out.schema["ts"].dataType, TimestampType)
    got = [r[0] for r in out.select(F.unix_micros("ts")).orderBy("event_id").collect()]
    assert got == rows_us


def test_load_table_pins_utc_on_foreign_tz_session(spark, sf_dir, duck):
    """The grading driver builds a vanilla session; on a non-UTC host its
    default TZ would shift the NTZ cast and every date function off the
    oracle.  load_table must pin UTC on the calling session."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ev = load_table(spark, sf_dir, "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        s = ev.agg(F.sum(F.unix_micros("ts")).alias("s")).first().s
        d = duck.execute("SELECT sum(epoch_us(ts)) FROM events").fetchone()[0]
        assert s == d
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_normalized_ts_matches_duckdb_oracle(spark, sf_dir, duck):
    """Value-level pin: the loader's normalized instants equal DuckDB's
    read of the same parquet — the driver's hash compare depends on this."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.agg(
        F.count("*").alias("n"),
        F.sum(F.unix_micros("ts")).alias("sum_us"),
        F.min(F.unix_micros("ts")).alias("min_us"),
        F.max(F.unix_micros("ts")).alias("max_us"),
    ).first()
    d = duck.execute(
        "SELECT count(*), sum(epoch_us(ts)), min(epoch_us(ts)), max(epoch_us(ts)) FROM events"
    ).fetchone()
    assert (s.n, s.sum_us, s.min_us, s.max_us) == d


def test_no_shadowed_top_level_defs():
    """A later `def` with the same name silently replaces an earlier one
    at import time (round 8 shipped exactly this for repetition_scores
    until pytest caught the changed schema) — forbid the bug class
    package-wide."""
    import ast
    import os

    pkg = os.path.join(os.path.dirname(__file__), "..", "eth_event_tracker_spark")
    dupes = []
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            with open(path) as f:
                tree = ast.parse(f.read())
            seen: dict[str, int] = {}
            for node in tree.body:
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                    if node.name in seen:
                        dupes.append(f"{path}:{node.lineno} re-defines {node.name} (first at {seen[node.name]})")
                    seen[node.name] = node.lineno
    assert not dupes, "\n".join(dupes)
