"""Binned range join (operators/rangejoin.py): exact semantics vs a
brute-force model, bin-boundary edge cases, and the no-cross-product
plan guarantee that is the operator's entire reason to exist."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from eth_event_tracker_spark.operators.rangejoin import binned_interval_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def tiny(spark):
    # points every 7 minutes over 2h; intervals of wildly mixed lengths,
    # including zero-length, sub-bin, multi-bin, and disjoint ones
    points = spark.createDataFrame(
        [(i, _ts(7 * i)) for i in range(18)], "p_id long, p_ts timestamp"
    )
    intervals = spark.createDataFrame(
        [
            (0, _ts(0), _ts(10)),      # sub-bin
            (1, _ts(5), _ts(95)),      # spans many 15-min bins
            (2, _ts(14), _ts(14)),     # empty (start == end): matches nothing
            (3, _ts(21), _ts(28)),     # starts exactly on a point
            (4, _ts(500), _ts(600)),   # disjoint from all points
            (5, _ts(-30), _ts(7)),     # straddles t=0; end exactly on a point
        ],
        "iv_id long, w_start timestamp, w_end timestamp",
    )
    return points, intervals


def brute(points, intervals):
    pr = [(r.p_id, r.p_ts) for r in points.collect()]
    ir = [(r.iv_id, r.w_start, r.w_end) for r in intervals.collect()]
    return sorted(
        (pid, iid) for pid, pts in pr for iid, s, e in ir if s <= pts < e
    )


@pytest.mark.parametrize("bin_width", [60, 15 * 60, 3600, 86400])
def test_matches_brute_force_at_any_bin_width(spark, tiny, bin_width):
    points, intervals = tiny
    got = binned_interval_join(
        points, intervals, "p_ts", "w_start", "w_end", bin_width=bin_width
    )
    assert sorted((r.p_id, r.iv_id) for r in got.collect()) == brute(points, intervals)


def test_half_open_semantics(spark, tiny):
    points, intervals = tiny
    got = binned_interval_join(points, intervals, "p_ts", "w_start", "w_end", 900)
    pairs = set((r.p_id, r.iv_id) for r in got.collect())
    assert (3, 3) in pairs      # p_ts == w_start is IN
    assert (1, 5) not in pairs  # p_ts == w_end is OUT
    assert all(iid != 2 for _, iid in pairs)  # empty interval matches nothing
    assert all(iid != 4 for _, iid in pairs)  # disjoint interval matches nothing


def test_no_duplicate_pairs_when_interval_spans_bins(spark, tiny):
    points, intervals = tiny
    # 60s bins: interval 1 covers ~90 bins — each pair must still appear once
    got = binned_interval_join(points, intervals, "p_ts", "w_start", "w_end", 60)
    rows = [(r.p_id, r.iv_id) for r in got.collect()]
    assert len(rows) == len(set(rows))


def test_plan_is_equality_join_not_cross_product(spark, tiny):
    points, intervals = tiny
    got = binned_interval_join(points, intervals, "p_ts", "w_start", "w_end", 900)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_input_validation(spark, tiny):
    points, intervals = tiny
    with pytest.raises(ValueError, match="overlapping"):
        binned_interval_join(points, points, "p_ts", "p_ts", "p_ts", 900)
    with pytest.raises(ValueError, match="positive"):
        binned_interval_join(points, intervals, "p_ts", "w_start", "w_end", 0)
    with pytest.raises(ValueError, match="reserved"):
        binned_interval_join(
            points.withColumn("_bin", F.lit(1)), intervals, "p_ts", "w_start", "w_end", 900
        )


# ---------------------------------------------------------------------------
# Property: randomized points/intervals vs the brute-force model
# ---------------------------------------------------------------------------
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_EPOCHS = st.integers(0, 3 * 86400)  # seconds across 3 days


@settings(max_examples=20, deadline=None)
@given(
    pts=st.lists(_EPOCHS, min_size=0, max_size=25),
    ivs=st.lists(st.tuples(_EPOCHS, st.integers(-3600, 2 * 86400)), min_size=0, max_size=12),
    w=st.sampled_from([60, 3600, 86400]),
)
def test_matches_model_on_random_inputs(spark, pts, ivs, w):
    """Random epochs and interval lengths — including NEGATIVE lengths
    (end < start: must match nothing) and empty inputs."""
    points = spark.createDataFrame(
        [(i, _ts(p / 60)) for i, p in enumerate(pts)] or [],
        "p_id long, p_ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(i, _ts(s / 60), _ts((s + ln) / 60)) for i, (s, ln) in enumerate(ivs)] or [],
        "iv_id long, w_start timestamp, w_end timestamp",
    )
    got = binned_interval_join(points, intervals, "p_ts", "w_start", "w_end", w)
    want = sorted(
        (pi, ii)
        for pi, p in enumerate(pts)
        for ii, (s, ln) in enumerate(ivs)
        if s <= p < s + ln
    )
    assert sorted((r.p_id, r.iv_id) for r in got.collect()) == want


def _mk_intervals(spark, rows, start, end, prefix):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    data = [
        (i, base + dt.timedelta(seconds=s), base + dt.timedelta(seconds=e))
        for i, (s, e) in enumerate(rows)
    ]
    return spark.createDataFrame(data, f"{prefix}_id long, {start} timestamp, {end} timestamp")


def test_interval_overlap_join_matches_brute_force(spark):
    """Half-open overlap vs brute force across bin widths; touching
    endpoints excluded; empty/negative intervals match nothing; no
    duplicate pairs despite multi-bin spans."""
    import random

    from eth_event_tracker_spark.operators.rangejoin import interval_overlap_join

    rng = random.Random(5)
    lrows = [(rng.randrange(0, 500), rng.randrange(0, 500)) for _ in range(60)]
    rrows = [(rng.randrange(0, 500), rng.randrange(0, 500)) for _ in range(60)]
    lrows += [(10, 20), (20, 30), (50, 50), (70, 60)]  # touching, empty, negative
    rrows += [(20, 30), (10, 20), (45, 55), (55, 75)]
    l = _mk_intervals(spark, lrows, "ls", "le", "l")
    r = _mk_intervals(spark, rrows, "rs", "re", "r")

    want = {
        (i, j)
        for i, (a, b) in enumerate(lrows)
        for j, (c, d) in enumerate(rrows)
        if a < d and c < b
    }
    for width in (7, 64, 1000):
        got = {
            (row.l_id, row.r_id)
            for row in interval_overlap_join(l, r, "ls", "le", "rs", "re", width).collect()
        }
        assert got == want, f"width {width}"

    from .test_plans import plan_of

    plan = plan_of(interval_overlap_join(l, r, "ls", "le", "rs", "re", 64))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


from hypothesis import given, settings
from hypothesis import strategies as st

_IVALS = st.lists(
    st.tuples(st.integers(0, 120), st.integers(0, 120)), min_size=1, max_size=12
)


@settings(max_examples=10, deadline=None)
@given(lrows=_IVALS, rrows=_IVALS, width=st.sampled_from([3, 17, 50, 200]))
def test_interval_overlap_join_fuzz(lrows, rrows, width, spark):
    """Randomized interval sets (degenerate/empty/negative included) vs
    the brute-force half-open overlap model at randomized bin widths."""
    from eth_event_tracker_spark.operators.rangejoin import interval_overlap_join

    l = _mk_intervals(spark, lrows, "ls", "le", "l")
    r = _mk_intervals(spark, rrows, "rs", "re", "r")
    want = {
        (i, j)
        for i, (a, b) in enumerate(lrows)
        for j, (c, d) in enumerate(rrows)
        if a < d and c < b
    }
    got = {
        (row.l_id, row.r_id)
        for row in interval_overlap_join(l, r, "ls", "le", "rs", "re", width).collect()
    }
    assert got == want
