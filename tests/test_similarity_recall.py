"""ann_recall: the promoted-to-operator form of the test-side recall
pins — exactness on identical inputs, per-query hit accounting, missing
queries scoring zero, and the registry entry's sane range."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_event_tracker_spark.operators.similarity import ann_recall


def _res(spark, rows):
    return spark.createDataFrame(rows, "q_id long, c_id long")


def test_recall_one_when_identical(spark):
    exact = _res(spark, [(1, 10), (1, 11), (2, 20)])
    out = {r.q_id: r for r in ann_recall(exact, exact).collect()}
    assert all(r.recall == 1.0 for r in out.values())
    assert out[1].n_truth == 2 and out[1].n_hit == 2


def test_recall_counts_partial_and_missing_queries(spark):
    exact = _res(spark, [(1, 10), (1, 11), (1, 12), (1, 13), (2, 20), (3, 30)])
    approx = _res(spark, [(1, 11), (1, 13), (1, 99), (2, 21)])  # q3 absent
    out = {r.q_id: r for r in ann_recall(exact, approx).collect()}
    assert out[1].n_truth == 4 and out[1].n_hit == 2 and out[1].recall == 0.5
    assert out[2].n_hit == 0 and out[2].recall == 0.0
    assert out[3].n_hit == 0 and out[3].recall == 0.0  # left join keeps it


def test_extra_approx_rows_never_inflate_recall(spark):
    exact = _res(spark, [(1, 10)])
    approx = _res(spark, [(1, 10), (1, 10), (1, 42), (9, 10)])
    out = ann_recall(exact, approx).collect()
    assert len(out) == 1
    assert out[0].n_truth == 1 and out[0].n_hit == 1 and out[0].recall == 1.0


def test_registry_entry_in_pinned_range(spark, sf_dir):
    from eth_event_tracker_spark.queries.llmdata import ann_recall_ivf

    rows = ann_recall_ivf(spark, sf_dir).collect()
    assert len(rows) == 5
    # the IVF arm's standing recall pin, now visible as a queryable number
    mean = sum(r.recall for r in rows) / len(rows)
    assert mean >= 0.8, [(r.q_id, r.recall) for r in rows]
    assert all(r.n_truth == 5 for r in rows)
