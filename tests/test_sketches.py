"""Count-min sketch: one-sided error, exactness when collision-free,
and the merge ≡ single-pass identity (the partial-aggregate property
that makes the sketch usable as bounded cross-batch state)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_event_tracker_spark.operators.sketches import cms_build, cms_estimate, cms_merge


def _truth(rows):
    t = {}
    for k in rows:
        t[k] = t.get(k, 0) + 1
    return t


def test_cms_overestimates_only_and_bounded(spark):
    # zipf-ish: key j appears ~1000//(j+1) times
    rows = [f"k{j}" for j in range(50) for _ in range(1000 // (j + 1))]
    truth = _truth(rows)
    df = spark.createDataFrame([(k,) for k in rows], "key string")
    d, w = 4, 256
    sk = cms_build(df, "key", d=d, w=w).cache()
    cands = spark.createDataFrame([(k,) for k in truth] + [("never_seen",)], "key string")
    est = {r.key: r.est for r in cms_estimate(sk, cands, "key", d=d, w=w).collect()}
    n = len(rows)
    eps = 2.718281828 / w
    for k, true in truth.items():
        assert est[k] >= true, f"{k}: CMS must never underestimate"
        assert est[k] <= true + 3 * eps * n, f"{k}: estimate {est[k]} way over {true}"
    assert est["never_seen"] <= 3 * eps * n
    sk.unpersist()


def test_cms_exact_when_collision_free(spark):
    rows = [f"key_{j}" for j in range(20) for _ in range(j + 1)]
    truth = _truth(rows)
    df = spark.createDataFrame([(k,) for k in rows], "key string")
    # w >> n_keys^2: collisions in ALL d rows are overwhelmingly unlikely
    sk = cms_build(df, "key", d=4, w=65536)
    cands = spark.createDataFrame([(k,) for k in truth], "key string")
    est = {r.key: r.est for r in cms_estimate(sk, cands, "key", d=4, w=65536).collect()}
    assert est == truth


def test_cms_merge_equals_single_pass(spark):
    rows = [f"k{j % 17}" for j in range(500)]
    df = spark.createDataFrame([(i, k) for i, k in enumerate(rows)], "i long, key string")
    whole = cms_build(df, "key", d=3, w=64)
    parts = [df.where(f"i % 3 = {r}") for r in range(3)]
    merged = cms_merge(*[cms_build(p, "key", d=3, w=64) for p in parts])
    a = {(r.row, r.col): r.cnt for r in whole.collect()}
    b = {(r.row, r.col): r.cnt for r in merged.collect()}
    assert a == b, "merge of partial sketches must equal the single-pass sketch"
