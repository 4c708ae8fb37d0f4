"""Round-11 pins.

1. Co-supply spread width (round-10 verdict item 2): the post-groupBy
   re-spread before the ~325× pair explode must scale with
   ``defaultParallelism`` — a hard-coded 32 silently under-spreads the
   explode on any cluster wider than this box.
2. Shared graph extraction (round-10 verdict item 3): within one
   session+sf_dir the graph family reuses ONE memoized co-supply build;
   ``SPARK_GRAFT_GRAPH_COLD=1`` forces the per-call rebuild (the bench
   contract), and both paths are row-identical.
3. Degenerate-sample k-means (round-11 advice): fewer corpus rows than
   k must yield min(k, n_sample) centroids — no cycle-padded duplicates
   that drift from the DuckDB twin after a Lloyd round.
4. Zero-norm guards (round-11 advice): cosine_topk_pandas and the
   portable k-means scorers fail loud on zero-norm vectors instead of
   silently ordering NaN differently from the oracle.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_cosupply_spread_tracks_default_parallelism(spark, sf_dir):
    """The re-spread width before the pair explode is defaultParallelism,
    not a literal.  Round-11 shape: ONE hash repartition on src (the pair
    explode, pair-count aggregate and top-5 window all reuse it), so the
    plan must carry RepartitionByExpression [src], dp — round-robin would
    mean the single-exchange restructure regressed, a literal width would
    re-introduce the hard-coded-32 under-spread (round-10 verdict item 2)."""
    import re

    from eth_event_tracker_spark.queries.relational import _build_cosupply_edges

    dp = spark.sparkContext.defaultParallelism
    plan = _build_cosupply_edges(spark, sf_dir)._jdf.queryExecution().toString()
    assert re.search(rf"RepartitionByExpression \[src#\d+L?\], {dp}\b", plan), (
        plan[:2000]
    )
    assert "RoundRobinPartitioning" not in plan, plan[:2000]


def test_cosupply_shared_extraction_row_identical(spark, sf_dir):
    from eth_event_tracker_spark.queries import relational as R

    R._COSUPPLY_CACHE.clear()
    old = os.environ.pop("SPARK_GRAFT_GRAPH_COLD", None)
    try:
        warm1 = R._cosupply_edges(spark, sf_dir)
        assert R._COSUPPLY_CACHE, "warm path must memoize"
        warm2 = R._cosupply_edges(spark, sf_dir)
        assert warm1 is warm2, "second call must reuse the memoized frame"

        os.environ["SPARK_GRAFT_GRAPH_COLD"] = "1"
        cold = R._cosupply_edges(spark, sf_dir)
        assert cold is not warm1, "cold flag must rebuild per call"

        wrows = sorted(map(tuple, warm1.collect()))
        crows = sorted(map(tuple, cold.collect()))
        assert wrows == crows and len(wrows) > 0
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_GRAPH_COLD", None)
        else:
            os.environ["SPARK_GRAFT_GRAPH_COLD"] = old
        R._COSUPPLY_CACHE.clear()


def test_portable_kmeans_degenerate_sample_stops_at_n(spark):
    """8 rows, k=16: exactly 8 centroids (LEAST(k, n_sample), matching
    the twin's seedlist) and every assignment lands on one of them."""
    from eth_event_tracker_spark.operators.semantic_portable import (
        assign_portable,
        build_portable_centroids,
        quantized,
    )

    rows = [(i, [float(i + 1), float((i * 7) % 5 + 1)]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qdf = df.select("vec_id", quantized(F.col("embedding")).alias("vq"))
    cents = build_portable_centroids(qdf, n_clusters=16, n_iters=2)
    assert len(cents) == 8
    assigned = assign_portable(qdf, cents)
    cids = {r.centroid_id for r in assigned.collect()}
    assert cids <= set(range(8))


def test_cosine_topk_pandas_zero_norm_fails_loud(spark):
    from eth_event_tracker_spark.operators.similarity import cosine_topk_pandas

    ok = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.5, 0.5])], "vec_id long, embedding array<double>"
    )
    zq = spark.createDataFrame(
        [(9, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="zero-norm query"):
        cosine_topk_pandas(zq, ok, k=1)
    with pytest.raises(Exception, match="zero-norm corpus"):
        cosine_topk_pandas(ok, ok.unionByName(zq), k=1).collect()


def test_portable_scorers_zero_centroid_fails_loud(spark):
    from eth_event_tracker_spark.operators.semantic_portable import (
        assign_portable,
        probe_portable,
        quantized,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
    ).select("vec_id", quantized(F.col("embedding")).alias("vq"))
    bad = [[1, 1], [0, 0]]
    with pytest.raises(ValueError, match="zero vector"):
        assign_portable(df, bad)
    with pytest.raises(ValueError, match="zero vector"):
        probe_portable(df, bad, n_probe=1)


def test_round_half_away_matches_engines():
    """The single-source rounding rule: half-away-from-zero (Spark
    F.round / DuckDB round(DOUBLE)), never numpy's half-even."""
    import numpy as np

    from eth_event_tracker_spark.operators.semantic_portable import _round_half_away

    x = np.array([0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 0.49, -0.49])
    out = _round_half_away(x)
    assert out.tolist() == [1.0, 2.0, 3.0, -1.0, -2.0, -3.0, 0.0, -0.0]


def test_semantic_dedup_decision_form_equals_expanded(spark):
    """The star-edge decision form (round-11: sf30 caught the C(d,2)
    pair expansion going quadratic in duplication) must keep the EXACT
    survivor set of the expanded-pair form on a duplicate-heavy corpus
    with planted near-duplicates."""
    import random

    from eth_event_tracker_spark.operators.semantic_portable import (
        semantic_dedup_portable,
    )

    rng = random.Random(7)
    base = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(40)]
    rows = []
    vid = 0
    for i, v in enumerate(base):
        for _ in range(1 + i % 5):  # duplication factor 1..5
            rows.append((vid, v))
            vid += 1
    # planted near-duplicates of every 4th base vector
    for i in range(0, 40, 4):
        rows.append((vid, [x + 1e-4 for x in base[i]]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    kept_fast = semantic_dedup_portable(df, threshold=0.9, n_clusters=4)
    kept_slow = semantic_dedup_portable(
        df, threshold=0.9, n_clusters=4, collapse_exact=False
    )
    a = sorted(r.vec_id for r in kept_fast.collect())
    b = sorted(r.vec_id for r in kept_slow.collect())
    assert a == b and 0 < len(a) < len(rows)


def test_weighted_lloyd_centroids_bit_identical(spark):
    """build_portable_centroids with a distinct-vq Lloyd table +
    multiplicities must return the EXACT centroids of the full-corpus
    run — Σ_corpus vq == Σ_groups cnt·vq on exact integers."""
    from eth_event_tracker_spark.operators.semantic_portable import (
        build_portable_centroids,
        quantized,
    )

    rows = []
    vid = 0
    for i in range(12):
        v = [float(i + 1), float((i * 3) % 7 + 1), float(i % 4 + 1)]
        for _ in range(1 + i % 4):
            rows.append((vid, v))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qdf = df.select("vec_id", quantized(F.col("embedding")).alias("vq"))
    full = build_portable_centroids(qdf, n_clusters=4, n_iters=2)
    grp = qdf.groupBy("vq").agg(
        F.min("vec_id").alias("vec_id"), F.count("*").alias("_cnt")
    )
    weighted = build_portable_centroids(
        qdf, n_clusters=4, n_iters=2, lloyd_df=grp, weight_col="_cnt"
    )
    assert full == weighted


def test_shingle_set_collapse_bit_equal_across_family(spark, sf_dir):
    """The identical-shingle-set pre-collapse (round-11 optimization:
    candidate volume must not square with the exact-duplicate factor)
    is bit-equal to the uncollapsed pipelines across the whole
    shingle-join family — jaccard doubles included (cross-group pairs
    reuse the reps' integer division; within-group pairs s/s = 1.0).
    The corpus is the fixture replicated 3× with disjoint ids (the
    sf1-smoke duplication shape), so every doc sits in a ≥3-member
    identical-set group and the collapse is actually exercised."""
    from eth_event_tracker_spark.operators import dedup as OPD

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    corpus = docs
    for i in (1, 2):
        corpus = corpus.unionByName(
            docs.select((F.col("doc_id") + 1_000_000_000 * i).alias("doc_id"), "text")
        )
    corpus = corpus.localCheckpoint()

    # the adaptive decision: replicated corpus → heavy (collapse), the
    # raw fixture (≈no exact dups) → light (identical to the old plan)
    assert OPD.corpus_dup_heavy(corpus) is True
    assert OPD.corpus_dup_heavy(docs) is False

    def pairs(df_out, cols):
        return {tuple(getattr(r, c) for c in cols) for r in df_out.collect()}

    for fn, cols in [
        (OPD.jaccard_pairs, ("doc_a", "doc_b", "jaccard")),
        (OPD.jaccard_pairs_prefix, ("doc_a", "doc_b", "jaccard")),
        (OPD.minhash_lsh_dedup, ("doc_a", "doc_b", "jaccard")),
        (OPD.containment_pairs, ("doc_a", "doc_b", "containment")),
    ]:
        got = pairs(fn(corpus, threshold=0.8), cols)
        ref = pairs(fn(corpus, threshold=0.8, collapse_identical=False), cols)
        assert got == ref and len(ref) > 0, fn.__name__

    sigs = OPD.minhash_signatures(corpus)
    got_c = pairs(OPD.lsh_candidates(sigs), ("doc_a", "doc_b"))
    ref_c = pairs(OPD.lsh_candidates(sigs, collapse_identical=False), ("doc_a", "doc_b"))
    assert got_c == ref_c and len(ref_c) > 0
