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
