"""BM25 retrieval, cross-source shingle overlap, and PSI drift — the
three round-7 corpus-analytics operators.  Oracle parity runs through
the registry (driver_sim / graded gate); these tests pin the SEMANTICS:
BM25's idf and length normalization order the right documents, the
overlap matrix counts planted contamination exactly and symmetrically,
and PSI is zero for an unshifted group and large for a shifted one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eth_event_tracker_spark.operators.profile import psi_drift, source_overlap
from eth_event_tracker_spark.operators.text import bm25_topk
from eth_event_tracker_spark.queries.llmdata import (
    bm25_topk_docs,
    drift_psi_sources,
    source_overlap_shingles,
)


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------
def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_idf_prefers_rarer_terms(spark):
    """Same tf, same length: the doc matching the RARE term outranks the
    doc matching the common one."""
    rows = [(0, "rare pad pad pad"), (1, "common pad pad pad")] + [
        (i, "common filler filler filler") for i in range(2, 12)
    ]
    out = bm25_topk(_docs(spark, rows), ["rare", "common"], top_n=12).collect()
    score = {r.doc_id: r.score for r in out}
    assert score[0] > score[1]


def test_bm25_length_normalization(spark):
    """Same tf of the query term: the shorter doc scores higher."""
    rows = [
        (0, "term pad"),
        (1, "term pad pad pad pad pad pad pad pad pad pad pad"),
        (2, "other text entirely"),
    ]
    out = bm25_topk(_docs(spark, rows), ["term"], top_n=5).collect()
    score = {r.doc_id: r.score for r in out}
    assert set(score) == {0, 1} and score[0] > score[1]


def test_bm25_tf_saturation(spark):
    """k1 saturates term frequency: tf 1→2 gains more than tf 9→10."""
    pad = " pad" * 20
    rows = [(t, ("term " * t) + pad) for t in (1, 2, 9, 10)]
    score = {
        r.doc_id: r.score
        for r in bm25_topk(_docs(spark, rows), ["term"], top_n=4).collect()
    }
    assert score[2] - score[1] > score[10] - score[9] > 0


def test_bm25_matched_counts_query_terms(spark, sf_dir):
    out = bm25_topk_docs(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == 10
    assert all(1 <= r.matched <= 3 for r in rows)
    # descending by score (ties impossible at e6 granularity here)
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


# ---------------------------------------------------------------------------
# source overlap
# ---------------------------------------------------------------------------
def test_source_overlap_planted_contamination(spark):
    """Two sources share one exact doc text; a third is disjoint.  The
    shared pair's n_shared = that doc's distinct shingle count; pairs
    with the disjoint source are absent (no zero rows)."""
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, shared, "sa"),
        (1, shared, "sb"),
        (2, "one two three four five six", "sc"),
        (3, "alpha beta gamma other tail here", "sa"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r.source_a, r.source_b): r for r in source_overlap(df).collect()}
    # 6 words → 4 distinct 3-gram shingles in the shared doc
    assert ("sa", "sb") in out and out[("sa", "sb")].n_shared == 4
    r = out[("sa", "sb")]
    # sb holds only the shared doc → containment vs min side is 1.0
    assert r.n_b == 4 and r.containment == 1.0
    # sa additionally holds doc 3's 4 shingles, one of which ("alpha beta
    # gamma") is shared with the copy → 7 distinct
    assert r.n_a == 7
    assert not any("sc" in k for k in out)


def test_source_overlap_matrix_shape(spark, sf_dir):
    out = source_overlap_shingles(spark, sf_dir).collect()
    # synthetic word-salad from one small vocab: all 20C2 pairs overlap
    assert len(out) == 190
    assert all(r.source_a < r.source_b for r in out)
    assert all(0 < r.containment <= 1.0 for r in out)


# ---------------------------------------------------------------------------
# PSI drift
# ---------------------------------------------------------------------------
def test_psi_zero_for_unshifted_and_large_for_shifted(spark):
    """Group 'same' mirrors the corpus distribution exactly (it IS half
    of it, uniformly) → smoothed p == q within rounding, psi ≈ 0.
    Group 'shift' concentrates in the top bucket → psi >> 0.25."""
    rows = [("same", float(v)) for v in (10, 20, 30, 40)] * 25 + [
        ("shift", 45.0)
    ] * 100
    df = spark.createDataFrame(rows, "g string, v double")
    psi = {r.g: r.psi for r in psi_drift(df, "g", "v", [15.0, 25.0, 35.0]).collect()}
    # 'same' has 25 per bucket, corpus has 50/50/50/150 → real drift from
    # the shifted group polluting the corpus side; compare directions:
    assert psi["shift"] > psi["same"] > 0
    assert psi["shift"] > 0.25


def test_psi_exactly_zero_when_group_is_whole_corpus(spark):
    rows = [("all", float(v)) for v in range(100)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = psi_drift(df, "g", "v", [25.0, 50.0, 75.0]).collect()
    assert len(out) == 1 and out[0].psi == 0.0


def test_psi_counts_never_hit_buckets(spark):
    """A bucket no group occupies still enters every group's sum via the
    generated grid (smoothing only — equal on both sides, so it nets to
    ~0), and a bucket only ONE group occupies drives the other group's
    psi up."""
    rows = [("a", 10.0)] * 50 + [("b", 90.0)] * 50
    df = spark.createDataFrame(rows, "g string, v double")
    out = psi_drift(df, "g", "v", [50.0])
    psi = {r.g: r.psi for r in out.collect()}
    assert psi["a"] > 0.25 and psi["b"] > 0.25
    assert out.columns == ["g", "psi"]


def test_drift_psi_sources_registry_shape(spark, sf_dir):
    out = drift_psi_sources(spark, sf_dir).collect()
    assert len(out) == 20
    # uniform synthetic sources: none should look "shifted"
    assert all(r.psi >= 0.0 for r in out)


def test_psi_null_group_drifts_like_any_other(spark):
    """A NULL group must keep its counts through the grid fill (null-safe
    joins — the temperature-sampler rationale): same distribution as a
    named group ⇒ same psi."""
    rows = (
        [(None, 10.0), (None, 90.0)] * 25
        + [("named", 10.0), ("named", 90.0)] * 25
    )
    df = spark.createDataFrame(rows, "g string, v double")
    psi = {r.g: r.psi for r in psi_drift(df, "g", "v", [50.0]).collect()}
    assert set(psi) == {None, "named"}
    assert psi[None] == psi["named"] == 0.0


# ---------------------------------------------------------------------------
# equi-depth histogram
# ---------------------------------------------------------------------------
def test_equidepth_buckets_within_one_and_cover_all(spark):
    """23 rows into 4 buckets: NTILE gives 6/6/6/5 (the first
    n mod b buckets take the extra row); depths sum to the total, and
    bucket value-ranges are non-decreasing."""
    from eth_event_tracker_spark.operators.profile import equidepth_histogram

    rows = [("g", i, float(i * 7 % 23)) for i in range(23)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = sorted(
        equidepth_histogram(df, "g", "v", "id", n_buckets=4).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.n for r in out] == [6, 6, 6, 5]
    assert sum(r.n for r in out) == 23
    for r in out:
        assert r.lo <= r.hi
    for a, b in zip(out, out[1:]):
        assert a.hi <= b.lo  # distinct values here ⇒ disjoint ranges


def test_equidepth_per_group_boundaries_adapt(spark):
    """Each group gets its OWN boundaries (the point vs fixed cuts):
    a 0-99 group and a 1000-1099 group produce disjoint [lo, hi]
    bands, both exactly equal-depth."""
    from eth_event_tracker_spark.operators.profile import equidepth_histogram

    rows = [("low", i, float(i)) for i in range(100)] + [
        ("high", i, float(1000 + i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = equidepth_histogram(df, "g", "v", "id", n_buckets=4).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r)
    assert all(len(v) == 4 for v in by_g.values())
    assert all(r.n == 25 for r in out)
    assert max(r.hi for r in by_g["low"]) < min(r.lo for r in by_g["high"])


def test_equidepth_ties_and_nulls_deterministic(spark):
    """All-equal values still split by the id tie-break (depths stay
    ±1); NULL values sort FIRST into bucket 1; result is identical
    after a repartition (the total order makes NTILE deterministic)."""
    from eth_event_tracker_spark.operators.profile import equidepth_histogram

    rows = [("g", i, 5.0) for i in range(10)] + [("g", 100 + i, None) for i in range(2)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = sorted(
        equidepth_histogram(df, "g", "v", "id", n_buckets=4).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.n for r in out] == [3, 3, 3, 3]
    # the two NULLs lead the total order: bucket 1 holds them, its
    # aggregates ignore NULL (lo==hi==5.0 from its one non-null row)
    assert out[0].lo == out[0].hi == 5.0
    again = sorted(
        equidepth_histogram(
            df.repartition(7, "id"), "g", "v", "id", n_buckets=4
        ).collect(),
        key=lambda r: r.bucket,
    )
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


def test_histogram_equidepth_registry_shape(spark, sf_dir):
    from eth_event_tracker_spark.queries.llmdata import histogram_equidepth_lengths

    out = histogram_equidepth_lengths(spark, sf_dir).collect()
    assert len(out) == 20 * 8
    for g in {r.source for r in out}:
        depths = [r.n for r in out if r.source == g]
        assert max(depths) - min(depths) <= 1


# ---------------------------------------------------------------------------
# correlation matrix
# ---------------------------------------------------------------------------
def test_corr_matrix_planted_correlations(spark):
    """y = 2x ⇒ corr(x,y) == 1; z = -x ⇒ corr(x,z) == -1; a noisy
    mid-band pair lands strictly between."""
    from eth_event_tracker_spark.operators.profile import corr_matrix

    rows = [
        (float(i), float(2 * i), float(-i), float(i % 7))
        for i in range(1, 101)
    ]
    df = spark.createDataFrame(rows, "x double, y double, z double, w double")
    out = {(r.col_x, r.col_y): r for r in corr_matrix(df, ["x", "y", "z", "w"]).collect()}
    assert len(out) == 6
    assert out[("x", "y")].corr == 1.0
    assert out[("x", "z")].corr == -1.0
    assert all(r.n == 100 for r in out.values())
    assert -1.0 < out[("x", "w")].corr < 1.0


def test_corr_matrix_null_pairwise_and_zero_variance(spark):
    """A NULL drops its row from that PAIR only (n differs per pair);
    a constant column has zero variance ⇒ corr is NULL, not NaN."""
    from eth_event_tracker_spark.operators.profile import corr_matrix

    rows = [
        (1.0, 2.0, 5.0),
        (2.0, 4.0, 5.0),
        (3.0, None, 5.0),
        (4.0, 8.0, 5.0),
    ]
    df = spark.createDataFrame(rows, "x double, y double, c double")
    out = {(r.col_x, r.col_y): r for r in corr_matrix(df, ["x", "y", "c"]).collect()}
    assert out[("x", "y")].n == 3 and out[("x", "y")].corr == 1.0
    assert out[("x", "c")].n == 4 and out[("x", "c")].corr is None
    assert out[("y", "c")].n == 3 and out[("y", "c")].corr is None


def test_corr_matrix_registry_shape(spark, sf_dir):
    from eth_event_tracker_spark.queries.llmdata import corr_matrix_lineitem

    out = corr_matrix_lineitem(spark, sf_dir).collect()
    assert len(out) == 6
    assert all(r.corr is not None and -1.0 <= r.corr <= 1.0 for r in out)
    # synthetic lineitem: price/quantity/discount/tax are independent
    assert all(abs(r.corr) < 0.3 for r in out)


# ---------------------------------------------------------------------------
# OLS trend profile
# ---------------------------------------------------------------------------
def test_ols_trend_recovers_planted_slope(spark):
    from eth_event_tracker_spark.operators.profile import ols_trend

    rows = (
        [("up", float(x), 3.0 + 2.0 * x) for x in range(50)]
        + [("down", float(x), 10.0 - 0.5 * x) for x in range(50)]
        + [("flatx", 7.0, float(v)) for v in range(5)]  # zero x variance
        + [("gaps", 0.0, 1.0), ("gaps", 1.0, None), ("gaps", 2.0, 5.0)]
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in ols_trend(df, "g", "x", "y").collect()}
    assert out["up"].slope == 2.0 and out["up"].intercept == 3.0
    assert out["down"].slope == -0.5 and out["down"].intercept == 10.0
    assert out["flatx"].slope is None and out["flatx"].intercept is None
    # NULL y drops that row only: fit through (0,1),(2,5) → slope 2, b 1
    assert out["gaps"].n == 2 and out["gaps"].slope == 2.0 and out["gaps"].intercept == 1.0


def test_ols_trend_registry_shape(spark, sf_dir):
    from eth_event_tracker_spark.queries.streams import trend_value_by_type

    out = trend_value_by_type(spark, sf_dir).collect()
    assert len(out) == 5
    # synthetic values are time-stationary: slopes are tiny but defined
    assert all(r.slope is not None and abs(r.slope) < 0.01 for r in out)
