"""VARIANT (Spark 4's open semi-structured binary type): typed path
extraction, graceful missing-path behavior, Parquet round trip, and the
registry query against its DuckDB oracle."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .oracle_harness import compare


def test_variant_typed_extraction(spark):
    df = spark.createDataFrame(
        [('{"a": 1, "b": {"c": "x"}, "arr": [10, 20]}',), ('{"a": 2, "arr": []}',)],
        "j string",
    ).select(F.parse_json("j").alias("v"))
    out = df.select(
        F.variant_get("v", "$.a", "long").alias("a"),
        F.variant_get("v", "$.b.c", "string").alias("c"),
        F.variant_get("v", "$.arr[1]", "long").alias("arr1"),
    ).collect()
    got = {(r.a, r.c, r.arr1) for r in out}
    assert got == {(1, "x", 20), (2, None, None)}


def test_try_variant_get_missing_and_mistyped(spark):
    """try_variant_get nulls instead of raising on a type mismatch —
    the drifting-payload contract: one bad producer row cannot fail the
    pipeline."""
    df = spark.createDataFrame([('{"a": "not-a-number"}',)], "j string").select(
        F.parse_json("j").alias("v")
    )
    row = df.select(
        F.try_variant_get("v", "$.a", "long").alias("a"),
        F.try_variant_get("v", "$.missing", "long").alias("m"),
    ).collect()[0]
    assert row.a is None and row.m is None


def test_variant_parquet_round_trip(spark, tmp_path):
    """Parquet writes VARIANT natively (shredded binary); a reread
    extracts identically — the persisted schema-on-read path."""
    df = spark.range(100).select(
        F.col("id"),
        F.parse_json(
            F.to_json(F.struct(F.col("id").alias("x"), (F.col("id") * 2).alias("y")))
        ).alias("v"),
    )
    path = os.path.join(str(tmp_path), "var")
    df.write.parquet(path)
    back = spark.read.parquet(path)
    assert dict(back.dtypes)["v"] == "variant"
    s = back.select(
        F.sum(F.variant_get("v", "$.x", "long")).alias("sx"),
        F.sum(F.variant_get("v", "$.y", "long")).alias("sy"),
    ).collect()[0]
    assert (s.sx, s.sy) == (4950, 9900)


def test_schema_of_variant(spark):
    df = spark.createDataFrame([('{"a": 1, "b": [1.5]}',)], "j string")
    got = df.select(F.schema_of_variant(F.parse_json("j")).alias("s")).collect()[0].s
    assert "OBJECT" in got and "a" in got and "ARRAY" in got


def test_events_variant_extract_vs_oracle(spark, sf_dir, duck):
    from eth_event_tracker_spark.queries import all_oracles, all_queries

    name = "events_variant_extract"
    compare(all_queries()[name](spark, sf_dir), duck, all_oracles()[name], name)


def test_json_quarantine_routes_reasons(spark):
    """Strict routing: well-formed parses, truncated JSON quarantines
    (the exact document Spark's permissive from_json would wrongly
    accept), NULL payload gets its own reason."""
    from pyspark.sql import functions as F

    from eth_event_tracker_spark.operators.scalars import json_quarantine

    rows = [
        (1, '{"k": 87}'),
        (2, '{"k": 87'),       # truncated — must NOT pass a strict parser
        (3, None),
        (4, '[1, 2, 3]'),      # valid JSON, non-object — still parses
        (5, 'not json at all'),
    ]
    df = spark.createDataFrame(rows, "id long, payload string")
    out = {r.id: r for r in json_quarantine(df, "payload", keep=["id"]).collect()}
    assert out[1].ok and out[1].reason == "ok"
    assert not out[2].ok and out[2].reason == "malformed_json"
    assert out[3].reason == "null_payload"
    assert out[4].ok
    assert out[5].reason == "malformed_json"
    k = {
        r.id: r.k
        for r in json_quarantine(df, "payload", keep=["id"])
        .select("id", F.try_variant_get("parsed", "$.k", "long").alias("k"))
        .collect()
    }
    assert k[1] == 87 and k[2] is None and k[4] is None
