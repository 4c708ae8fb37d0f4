"""HLL distinct-count profiles (DataSketches HLL via hll_sketch_agg):
error bound at the default lgk, merge algebra (order-independent,
idempotent — no double counting on overlap), and the persisted
incremental-update round trip that makes the profile maintainable
without re-reading history.

Estimator note pinned here: union drops the single-stream HIP estimator
(register-based estimate only), so merged-vs-direct estimates may differ
within the error bound — the tests compare like with like (union path vs
union path, exactly; any path vs exact truth, within bound)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from eth_event_tracker_spark.operators import sketches as OPK


def test_hll_error_bound_100k(spark):
    """lgk=12 → standard error ~1.6%; pin ≤ 4% (2.5σ) at n=100k."""
    df = spark.range(100_000).select(
        (F.col("id") % 4).alias("g"), F.col("id").alias("v")
    )
    rows = OPK.hll_profile(df, ["g"], "v").collect()
    assert len(rows) == 4
    for r in rows:
        exact = 25_000
        assert abs(r.n_distinct_est - exact) <= 0.04 * exact, (r.g, r.n_distinct_est)


def test_hll_merge_algebra(spark):
    """Union is register-wise max: order-independent and idempotent, so
    overlapping batches never double count — merge(whole, lo⊆whole) has
    exactly the registers of merge(whole, whole)."""
    whole = spark.range(50_000).select(F.lit("all").alias("g"), F.col("id").alias("v"))
    lo = whole.where(F.col("v") < 20_000)
    hi = whole.where(F.col("v") >= 20_000)
    p_whole = OPK.hll_profile(whole, ["g"], "v")
    p_lo = OPK.hll_profile(lo, ["g"], "v")
    p_hi = OPK.hll_profile(hi, ["g"], "v")

    est = lambda prof: prof.collect()[0].n_distinct_est  # noqa: E731
    ab = est(OPK.hll_merge_profiles(p_lo, p_hi, keys=["g"]))
    ba = est(OPK.hll_merge_profiles(p_hi, p_lo, keys=["g"]))
    assert ab == ba  # commutative, exactly
    assert abs(ab - 50_000) <= 0.04 * 50_000  # within bound of truth

    dup = est(OPK.hll_merge_profiles(p_whole, p_lo, keys=["g"]))
    idem = est(OPK.hll_merge_profiles(p_whole, p_whole, keys=["g"]))
    assert dup == idem  # lo ⊆ whole adds nothing: no double count, exactly


def test_hll_persisted_incremental_update(spark, tmp_path):
    """Day-1 sketches parquet-persisted; day-2 arrives; union of the
    READ-BACK sketches with day-2's == union of the in-memory ones,
    exactly (persistence loses no register state).  No raw-data
    re-scan."""
    day1 = spark.range(10_000).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("v")
    )
    day2 = spark.range(5_000, 18_000).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("v")
    )
    path = os.path.join(str(tmp_path), "profile")
    p1 = OPK.hll_profile(day1, ["g"], "v")
    p2 = OPK.hll_profile(day2, ["g"], "v")
    p1.write.parquet(path)
    restored = spark.read.parquet(path)
    got = {
        r.g: r.n_distinct_est
        for r in OPK.hll_merge_profiles(restored, p2, keys=["g"]).collect()
    }
    want = {
        r.g: r.n_distinct_est
        for r in OPK.hll_merge_profiles(p1, p2, keys=["g"]).collect()
    }
    assert got == want
    # and the merged estimate tracks the true distinct count (18k split
    # evenly over two groups; day overlap 5k–10k must not double count)
    for g, est in got.items():
        assert abs(est - 9_000) <= 0.04 * 9_000, (g, est)


def test_hll_registry_entry_small_n_is_near_exact(spark, sf_dir):
    """On the fixture events (≤ a few hundred distinct users/type) the
    sketch is still in its exact-ish coupon regime — every group within
    the 2% flag the query itself carries."""
    from eth_event_tracker_spark.queries import all_queries

    rows = all_queries()["distinct_profile_hll"](spark, sf_dir).collect()
    assert rows and all(r.within_2pct for r in rows)
