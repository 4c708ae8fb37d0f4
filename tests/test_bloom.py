"""Bloom-prefilter filter-against-corpus: exactness is parameter-
independent (the verify join removes false positives; false negatives
are impossible), the corpus side never shuffles before the probe, and
the prefilter actually prunes (candidate set ≈ true matches at the
default sizing)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from eth_event_tracker_spark.operators import bloom as OPB
from eth_event_tracker_spark.operators.text import normalize
from eth_event_tracker_spark.tables import load_table


def _plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _exact_twin(corpus, incoming):
    nrm = normalize(F.col("text"))
    inc = incoming.withColumn("_norm", nrm)
    corp = corpus.select(nrm.alias("_norm")).where(F.col("_norm").isNotNull()).distinct()
    return inc.join(corp, "_norm", "left_anti").drop("_norm")


def _split(docs):
    copies = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    novel = docs.where(F.col("doc_id") % 7 == 1).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" fresh tail")).alias("text"),
    )
    return copies.unionByName(novel)


def test_bloom_equals_exact_anti_join(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    incoming = _split(docs)
    got = {r.doc_id for r in OPB.bloom_filter_against(docs, incoming).collect()}
    want = {r.doc_id for r in _exact_twin(docs, incoming).collect()}
    assert got == want
    # sanity on the plant: every copy dropped, every novel doc survives
    assert all(i >= 300000 for i in got) and got


def test_bloom_exact_under_heavy_false_positives(spark, sf_dir):
    """A deliberately undersized filter (256 bits for hundreds of docs →
    nearly every corpus row becomes a candidate) must still return the
    bit-identical result: correctness never depends on sizing."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    incoming = _split(docs)
    got = {
        r.doc_id
        for r in OPB.bloom_filter_against(docs, incoming, m_bits=256, k=2).collect()
    }
    want = {r.doc_id for r in _exact_twin(docs, incoming).collect()}
    assert got == want


def test_bloom_prunes_at_default_sizing(spark, sf_dir):
    """The probe's candidate set should be ≈ the true-match set, not the
    corpus: with m≈10 bits/item the false-positive rate is ~1%."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    incoming = _split(docs)
    nrm = normalize(F.col("text"))
    inc = incoming.withColumn("_norm", nrm).withColumn("_h", F.xxhash64("_norm"))
    bitmap = OPB.build_bloom(inc, "_h", m_bits=1 << 20, k=5)
    corp = docs.select(nrm.alias("_norm")).withColumn("_h", F.xxhash64("_norm"))
    n_corpus = corp.count()
    n_candidates = OPB.bloom_probe(corp, "_h", bitmap, k=5).count()
    n_true = corp.join(inc.select("_norm"), "_norm", "left_semi").count()
    assert n_candidates >= n_true  # no false negatives, ever
    assert n_candidates <= n_true + max(3, int(0.02 * n_corpus))


def test_bloom_probe_is_unshuffled_scan(spark, sf_dir):
    """The 100 TB property: the corpus branch runs scan → probe with no
    Exchange before the Python stage (the only shuffle in the whole
    operator is the tiny candidate anti-join)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    nrm = normalize(F.col("text"))
    corp = docs.select(nrm.alias("_norm")).withColumn("_h", F.xxhash64("_norm"))
    bitmap = OPB.build_bloom(corp.limit(10), "_h", m_bits=1 << 12, k=3)
    plan = _plan_of(OPB.bloom_probe(corp, "_h", bitmap, k=3))
    assert "Exchange" not in plan
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan


def test_bloom_edge_cases(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, None)], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [(10, "ALPHA   beta"), (11, "gamma"), (12, None)], "doc_id long, text string"
    )
    # normalization matches case/whitespace; NULL text always survives
    got = {r.doc_id for r in OPB.bloom_filter_against(corpus, incoming).collect()}
    assert got == {11, 12}
    # empty incoming → empty result; empty corpus → everything survives
    empty = incoming.where(F.lit(False))
    assert OPB.bloom_filter_against(corpus, empty).count() == 0
    assert {
        r.doc_id for r in OPB.bloom_filter_against(empty, incoming).collect()
    } == {10, 11, 12}


def test_positions_deterministic_and_in_range():
    h = np.array([0, 1, -1, 2**63 - 1, -(2**63)], dtype=np.int64).view(np.uint64)
    pos = OPB._positions(h, k=5, m_bits=1 << 16)
    assert pos.shape == (5, 5)
    assert (pos < (1 << 16)).all()
    again = OPB._positions(h, k=5, m_bits=1 << 16)
    assert (pos == again).all()


# ---------------------------------------------------------------------------
# row-form filter (bloom_rows / bloom_rows_member) — the mergeable twin
# ---------------------------------------------------------------------------
def _rowset(df):
    return {(r.word, r.bits) for r in df.collect()}


def test_bloom_rows_build_is_exactly_deterministic(spark):
    """Unlike HLL, the OR of bit masks has no merge-tree dependence: the
    same keys under any partitioning give bit-identical rows."""
    keys = spark.createDataFrame([(f"k{i}",) for i in range(500)], "key string")
    a = _rowset(OPB.bloom_rows(keys.repartition(1), "key"))
    b = _rowset(OPB.bloom_rows(keys.repartition(32), "key"))
    assert a == b and a


def test_bloom_rows_merge_equals_whole(spark):
    """fold(build(A) ∪ build(B)) == build(A ∪ B), exactly — including a
    50% overlap (idempotence)."""
    mk = lambda lo, hi: spark.createDataFrame(
        [(f"k{i}",) for i in range(lo, hi)], "key string"
    )
    pa, pb = OPB.bloom_rows(mk(0, 300), "key"), OPB.bloom_rows(mk(150, 450), "key")
    folded = pa.unionByName(pb).groupBy("word").agg(F.bit_or("bits").alias("bits"))
    assert _rowset(folded) == _rowset(OPB.bloom_rows(mk(0, 450), "key"))


def test_bloom_rows_no_false_negatives_even_tiny(spark):
    """m = 1024 bits for 500 keys — saturated, useless fp-wise, but a
    member can never read absent."""
    keys = spark.createDataFrame([(f"k{i}",) for i in range(500)], "key string")
    sk = OPB.bloom_rows(keys, "key", m_bits=1 << 10)
    got = OPB.bloom_rows_member(sk, keys, "key", m_bits=1 << 10).collect()
    assert len(got) == 500 and all(r.maybe_member for r in got)


def test_bloom_rows_fp_rate_and_bounded_size(spark):
    keys = spark.createDataFrame([(f"k{i}",) for i in range(1000)], "key string")
    sk = OPB.bloom_rows(keys, "key")
    # bounded by the table width: 1000 keys * 5 probes << 2^20/64 words
    assert sk.count() <= (1 << 20) // 64
    fresh = spark.createDataFrame([(f"x{i}",) for i in range(1000)], "key string")
    fps = [
        r.key
        for r in OPB.bloom_rows_member(sk, fresh, "key").collect()
        if r.maybe_member
    ]
    # expected fp ≈ (1 - e^{-5*1000/2^20})^5 ~ 1e-12 → zero in practice
    assert len(fps) <= 2, fps
