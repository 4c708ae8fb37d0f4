"""SQ8 scalar quantization (operators/similarity.py sq_*): the per-dim
byte tier beside PQ's subvector tier.  Pins: encode bit-equal to the
numpy twin (floor(+0.5) on both sides — no tie-rule divergence), decode
error bounded by step/2, degenerate/out-of-range semantics, recall vs
the exact tier, exclude_self uniformity, and the compressed-domain scan
shape (codes only — the raw vectors never enter the ADC scan)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from eth_event_tracker_spark.operators.similarity import (
    sq_adc_topk,
    sq_encode,
    sq_train,
)
from eth_event_tracker_spark.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def bounds(emb):
    return sq_train(emb)


def _np_encode(x, bounds):
    lo, hi = bounds
    step = (hi - lo) / 255.0
    inv = np.where(step > 0, 1.0 / np.where(step > 0, step, 1.0), 0.0)
    return np.clip(np.floor((x - lo) * inv + 0.5), 0, 255).astype(np.int64)


def test_train_bounds_cover_corpus(emb, bounds):
    assert bounds.shape == (2, 64)
    assert (bounds[1] >= bounds[0]).all()
    mins = emb.select(F.min(F.col("embedding")[0].cast("double"))).first()[0]
    assert bounds[0, 0] == mins


def test_encode_matches_numpy_twin(emb, bounds):
    rows = sq_encode(emb.limit(50), bounds).select("vec_id", "embedding", "sq_codes").collect()
    for r in rows:
        want = _np_encode(np.asarray(r["embedding"], dtype=np.float64), bounds)
        assert list(want) == r["sq_codes"], f"vec {r['vec_id']} diverged"
        assert all(0 <= c <= 255 for c in r["sq_codes"])


def test_decode_error_bounded_by_half_step(emb, bounds):
    lo, hi = bounds
    step = (hi - lo) / 255.0
    rows = sq_encode(emb.limit(50), bounds).collect()
    for r in rows:
        x = np.asarray(r["embedding"], dtype=np.float64)
        decoded = lo + np.asarray(r["sq_codes"], dtype=np.float64) * step
        # in-range values reconstruct within half a quantization step
        err = np.abs(decoded - x)
        assert (err <= step / 2 + 1e-12).all()


def test_degenerate_and_out_of_range(spark):
    bounds = np.array([[0.0, 5.0], [1.0, 5.0]])  # dim 1 is constant
    df = spark.createDataFrame(
        [(1, [0.5, 5.0]), (2, [-9.0, 5.0]), (3, [99.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r["sq_codes"] for r in sq_encode(df, bounds).collect()}
    assert got[1][1] == 0 and got[2][1] == 0, "constant dim encodes 0"
    assert got[2][0] == 0 and got[3][0] == 255, "out-of-range clamps"
    lo, hi = bounds
    step = (hi - lo) / 255.0
    assert lo[1] + got[1][1] * step[1] == 5.0, "constant dim decodes exactly"


def test_recall_vs_exact_and_exclude_self(spark, emb, bounds):
    queries = emb.where(F.col("vec_id") < 5)
    corpus = emb.where(F.col("vec_id") >= 5)
    codes = sq_encode(corpus, bounds)
    got = sq_adc_topk(queries, codes, bounds, k=5).collect()
    assert {r["q_id"] for r in got} == set(range(5))
    assert all(r["vec_id"] != r["q_id"] for r in got)

    # exact L2 top-5 via brute force on the driver (fixture-sized)
    qr = {r["vec_id"]: np.asarray(r["embedding"]) for r in queries.collect()}
    cr = {r["vec_id"]: np.asarray(r["embedding"]) for r in corpus.collect()}
    hits = 0
    for qid, qv in qr.items():
        dists = sorted(
            (float(((qv - cv) ** 2).sum()), cid) for cid, cv in cr.items()
        )
        truth = {cid for _, cid in dists[:5]}
        mine = {r["vec_id"] for r in got if r["q_id"] == qid}
        hits += len(truth & mine)
    recall = hits / (5 * len(qr))
    assert recall >= 0.9, f"SQ8 recall {recall} below the 8-bit expectation"
    # the rerank is exact: every returned dist equals the true distance
    for r in got:
        true = float(((qr[r["q_id"]] - cr[r["vec_id"]]) ** 2).sum())
        assert r["dist"] == pytest.approx(true, abs=1e-9)


def test_adc_scan_reads_codes_only(spark, emb, bounds, tmp_path):
    """Compressed-domain contract: persist (id, codes, vec) and search —
    the ADC scan's parquet read must NOT include the raw vector column
    (it is read only by the shortlist rerank join)."""
    queries = emb.where(F.col("vec_id") < 3)
    path = str(tmp_path / "sqidx")
    sq_encode(emb.where(F.col("vec_id") >= 3), bounds).write.parquet(path)
    codes = spark.read.parquet(path)
    out = sq_adc_topk(queries, codes, bounds, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "Scan parquet" in ln]
    assert any(
        "sq_codes" in ln and "embedding" not in ln for ln in scans
    ), f"no codes-only scan found:\n{plan[:2000]}"
    assert out.count() == 9
