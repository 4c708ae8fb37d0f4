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


# ---------------------------------------------------------------------------
# ivf_tune_nprobe: the monitor closed into a loop (round-7 verdict item 5).
# Fixture geometry: three tight 2-D direction clusters at 0/20/40 degrees;
# boundary queries at 10/30 degrees have true neighbours in TWO adjacent
# clusters, so probing one bucket cannot reach the target and probing two
# must.  Deterministic (explicit angles, no randomness).
# ---------------------------------------------------------------------------
def _angle_vec(deg: float) -> list[float]:
    import math

    return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]


def _tune_fixture(spark):
    corpus_rows = []
    vid = 0
    for base in (0.0, 20.0, 40.0):
        for j in range(10):
            corpus_rows.append((vid, _angle_vec(base + (j - 4.5) * 0.4)))
            vid += 1
    queries_rows = [(100, _angle_vec(10.0)), (101, _angle_vec(30.0))]
    schema = "vec_id long, embedding array<double>"
    return (
        spark.createDataFrame(queries_rows, schema),
        spark.createDataFrame(corpus_rows, schema),
    )


def test_ivf_tune_nprobe_minimal_probe_meets_target(spark):
    from eth_event_tracker_spark.operators.similarity import (
        ann_recall,
        ivf_tune_nprobe,
    )

    queries, corpus = _tune_fixture(spark)
    n_probe, curve = ivf_tune_nprobe(
        queries,
        corpus,
        k=6,
        n_centroids=3,
        target_recall=0.9,
        exclude_self=False,
    )
    # probe=1 must fail (each query's 6 nearest straddle two clusters:
    # one bucket holds at most 10 of 30 candidates and the true top-6
    # splits across the boundary), a wider probe must pass
    assert curve[0]["n_probe"] == 1 and curve[0]["mean_recall"] < 0.9
    assert 1 < n_probe <= 3
    # the full curve evaluates in one job; chosen = FIRST level meeting
    # target, every earlier level is below it
    by_level = {pt["n_probe"]: pt["mean_recall"] for pt in curve}
    assert len(curve) == 3  # max_probe defaults to n_centroids
    assert by_level[n_probe] >= 0.9
    assert all(by_level[p] < 0.9 for p in range(1, n_probe))
    # curve is monotone non-decreasing (candidates only grow with probe)
    rs = [pt["mean_recall"] for pt in curve]
    assert rs == sorted(rs)


def test_ivf_tune_nprobe_trivial_target_picks_one(spark):
    from eth_event_tracker_spark.operators.similarity import ivf_tune_nprobe

    queries, corpus = _tune_fixture(spark)
    n_probe, curve = ivf_tune_nprobe(
        queries, corpus, k=2, n_centroids=3, target_recall=0.0, exclude_self=False
    )
    assert n_probe == 1 and curve[0]["n_probe"] == 1
