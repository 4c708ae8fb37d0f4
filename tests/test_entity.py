"""Entity resolution: transitive closure, golden-record election,
short-key exact-only linking, NULL keys, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_event_tracker_spark.operators.entity import resolve_entities


def _resolve(spark, rows, **kw):
    df = spark.createDataFrame(rows, "id long, name string")
    return {
        r.id: r for r in resolve_entities(df, "name", "id", **kw).collect()
    }


def test_transitive_chain_is_one_entity(spark):
    # acme corp ~ acme corp. ~ acme corp.. — ends differ by 2 edits but
    # chain through the middle: ER must merge all three (plus the exact
    # duplicate of the first), with the min id as entity and canonical
    out = _resolve(
        spark,
        [
            (1, "acme corp"),
            (2, "acme corp."),
            (3, "acme corp.."),
            (4, "acme corp"),
            (9, "zzz totally different"),
        ],
    )
    assert {out[i].entity_id for i in (1, 2, 3, 4)} == {1}
    assert out[1].is_canonical and not any(out[i].is_canonical for i in (2, 3, 4))
    assert out[1].n_members == 4
    assert out[9].entity_id == 9 and out[9].is_canonical and out[9].n_members == 1


def test_min_members_filter_reports_merged_only(spark):
    out = _resolve(
        spark,
        [(1, "widget alpha"), (2, "widget alphb"), (3, "unrelated thing")],
        min_members=2,
    )
    assert set(out) == {1, 2}
    assert out[1].entity_id == out[2].entity_id == 1


def test_short_keys_link_by_exact_equality_only(spark):
    # "ab" vs "ac" is one edit apart but below the q-gram guarantee
    # bound — linked only when EQUAL (documented fuzzy_pairs contract)
    out = _resolve(spark, [(1, "ab"), (2, "ac"), (3, "ab")])
    assert out[1].entity_id == out[3].entity_id == 1
    assert out[2].entity_id == 2


def test_null_keys_drop(spark):
    df = spark.createDataFrame(
        [(1, "something here"), (2, None)], "id long, name string"
    )
    got = resolve_entities(df, "name", "id").collect()
    assert [r.id for r in got] == [1]


def test_score_based_golden_record(spark):
    spark_df = spark.createDataFrame(
        [(1, "acme corp"), (2, "acme corp."), (3, "other co entirely")],
        "id long, name string",
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5)], "id long, quality double"
    )
    out = {
        r.id: r
        for r in resolve_entities(
            spark_df, "name", "id", scores=scores, score_col="quality"
        ).collect()
    }
    # entity id stays the min id, but the canonical flag follows quality
    assert out[1].entity_id == out[2].entity_id == 1
    assert out[2].is_canonical and not out[1].is_canonical
    assert out[3].is_canonical


def test_resolution_stable_under_repartition(spark):
    rows = [(i, f"name number {i // 3}x") for i in range(60)]
    df = spark.createDataFrame(rows, "id long, name string")
    a = sorted(
        (r.id, r.entity_id, r.is_canonical)
        for r in resolve_entities(df, "name", "id").collect()
    )
    b = sorted(
        (r.id, r.entity_id, r.is_canonical)
        for r in resolve_entities(df.repartition(13), "name", "id").collect()
    )
    assert a == b
