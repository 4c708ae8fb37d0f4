"""Round-9 scale fixes.

1. SemDeDup exact-duplicate collapse: `semantic_dup_pairs(collapse_exact=
   True)` must emit the bit-identical pair set of the uncollapsed
   within-cluster join on a duplicate-heavy corpus — the same pin the
   LSH tier carries (test_round8_analytics.test_near_dup_lsh_collapse_
   is_bit_equal).  Without the collapse, duplicated vectors multiply
   every k-means cluster and candidates grow with the SQUARE of the
   duplication factor (sf≈1.0 smoke: 106 s of a 150 s budget).
2. Auto-scaled n_clusters (n_clusters=None): k grows with the corpus so
   expected cluster size — hence per-cluster pair cost — stays bounded.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _replicated_embeddings(spark, sf_dir, copies=3, shift=100000):
    from eth_event_tracker_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dup = emb
    for i in range(1, copies):
        dup = dup.unionByName(
            emb.select((F.col("vec_id") + i * shift).alias("vec_id"), "embedding", "label")
        )
    return emb, dup


def test_semantic_dup_pairs_collapse_is_bit_equal(spark, sf_dir):
    from eth_event_tracker_spark.operators.similarity import semantic_dup_pairs

    emb, dup = _replicated_embeddings(spark, sf_dir)
    a = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in semantic_dup_pairs(dup, threshold=0.85, n_clusters=8).collect()
    )
    b = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in semantic_dup_pairs(
            dup, threshold=0.85, n_clusters=8, collapse_exact=False
        ).collect()
    )
    assert a == b and len(a) > 0
    # every 3-way duplicate family contributes its 3 intra pairs at cosine 1.0
    first = emb.select(F.min("vec_id")).first()[0]
    fam = {p for p in a if {p[0], p[1]} <= {first, first + 100000, first + 200000}}
    assert len(fam) == 3
    assert all(p[2] == 1.0 for p in fam)


def test_semantic_dup_pairs_auto_k_scales_with_corpus(spark, sf_dir):
    """n_clusters=None derives k = max(16, N/256+1): tiny corpora keep
    the legacy 16; a corpus of ~26k rows must get a bigger k (observable
    as >16 distinct centroid assignments being possible — we assert on
    the documented formula via a direct call)."""
    from eth_event_tracker_spark.operators.similarity import (
        ivf_assign,
        ivf_build_centroids,
        semantic_dup_pairs,
    )
    from eth_event_tracker_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    # behavior contract at small N: auto == legacy 16 → same pairs
    auto = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in semantic_dup_pairs(emb, threshold=0.85, n_clusters=None).collect()
    )
    legacy = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in semantic_dup_pairs(emb, threshold=0.85, n_clusters=16).collect()
    )
    n = emb.count()
    if max(16, min(4096, int(n / 256) + 1)) == 16:
        assert auto == legacy
    else:
        assert len(auto) > 0


def test_semantic_dedup_collapse_keeps_same_survivors(spark, sf_dir):
    """End-to-end semantic_dedup must keep the identical survivor set
    with and without the collapse (components over a bit-equal pair set
    are equal)."""
    from eth_event_tracker_spark.operators.similarity import semantic_dedup

    _, dup = _replicated_embeddings(spark, sf_dir)
    kept_a = {r.vec_id for r in semantic_dedup(dup, 0.9, 8).select("vec_id").collect()}
    kept_b = {
        r.vec_id
        for r in semantic_dedup(dup, 0.9, 8, collapse_exact=False)
        .select("vec_id")
        .collect()
    }
    assert kept_a == kept_b and len(kept_a) > 0


def test_benford_excludes_zero_cent_amounts(spark):
    """Amounts in (0, 0.005) round to 0 cents — digit '0' has no grid
    row, so they must not count in n_tot (round-8 advice)."""
    from eth_event_tracker_spark.queries.relational import benford_digits

    df = spark.createDataFrame(
        [(0.001,), (0.004,), (1.0,), (2.0,), (3.0,)], "amt double"
    )
    rows = {r.digit: r for r in benford_digits(df, "amt").collect()}
    # only the three >= 1-cent amounts count
    assert sum(r.n_obs for r in rows.values()) == 3
    assert abs(rows[1].obs_p - 1.0 / 3.0) < 1e-9


def test_mmr_rerank_string_ids(spark):
    """mmr_rerank must work for any orderable id type (round-8 advice:
    the tuple tie-break used -id, which raises on strings)."""
    from eth_event_tracker_spark.operators.similarity import mmr_rerank

    q = spark.createDataFrame([("q0", [1.0, 0.0])], "vec_id string, embedding array<float>")
    c = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [1.0, 0.0]), ("c", [0.6, 0.8])],
        "vec_id string, embedding array<float>",
    )
    rows = mmr_rerank(q, c, k=3, fetch_k=10, lam=0.3).collect()
    assert [r.rank for r in rows] == [1, 2, 3]
    # candidates a and b are identical → the score tie breaks id-asc
    assert rows[0].c_id == "a"
    assert rows[0].q_id == "q0" and isinstance(rows[0].c_id, str)


def test_tokenizer_materialized_once_in_ngram_plans(spark, sf_dir):
    """HOF re-evaluation guard (round-9 find): a higher-order-function
    lambda body is re-evaluated per element, so the regex tokenizer must
    never appear inside the gram-transform lambda — it must be
    materialized as a column first.  Invariant: exactly ONE
    regexp_replace in the optimized plan (the broken expression form
    shows a second one inside lambdafunction and costs O(tokens²)/doc —
    profiled 9.8s vs 0.5s at sf0.1)."""
    from eth_event_tracker_spark.operators.text import word_shingles
    from eth_event_tracker_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = word_shingles(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("regexp_replace") == 1
    # and never nested under the transform lambda
    for line in plan.splitlines():
        if "lambdafunction" in line:
            assert "regexp_replace" not in line.split("lambdafunction", 1)[1]


def test_mmr_matches_python_model_on_planted_ties(spark):
    """Property pin for the oracle-promoted MMR: on a corpus with
    duplicate vectors (score ties) and a tiny candidate pool, the
    operator must equal a direct python replay of the greedy contract
    (same ordered-fold arithmetic, ties (score desc, id asc))."""
    import math

    from eth_event_tracker_spark.operators.similarity import mmr_rerank

    lam, k = 0.3, 4
    q_vec = [1.0, 0.0, 0.0]
    corpus = {
        10: [1.0, 0.0, 0.0],   # identical to query
        11: [1.0, 0.0, 0.0],   # duplicate of 10 -> tie, id-asc must win
        12: [0.0, 1.0, 0.0],   # orthogonal (diverse)
        13: [0.6, 0.8, 0.0],
        14: [0.6, 0.8, 0.0],   # duplicate of 13
    }
    q = spark.createDataFrame([(0, q_vec)], "vec_id long, embedding array<float>")
    c = spark.createDataFrame(
        [(i, v) for i, v in corpus.items()], "vec_id long, embedding array<float>"
    )
    got = [
        (r.rank, r.c_id, r.relevance, r.mmr_score)
        for r in mmr_rerank(q, c, k=k, fetch_k=10, lam=lam).collect()
    ]

    import numpy as np

    # the column is array<float>: round-trip through float32 like storage
    corpus = {i: [float(np.float32(x)) for x in v] for i, v in corpus.items()}
    q_vec = [float(np.float32(x)) for x in q_vec]

    def fold(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s = s + float(x) * float(y)
        return s

    # python replay of the contract
    def cos(a, b):
        return fold(a, b) / (math.sqrt(fold(a, a)) * math.sqrt(fold(b, b)))

    rel = {i: round(cos(q_vec, v), 9) for i, v in corpus.items()}
    order = sorted(corpus, key=lambda i: (-rel[i], i))
    norms = {i: math.sqrt(fold(v, v)) or 1.0 for i, v in corpus.items()}
    sim = {
        (i, j): fold(corpus[i], corpus[j]) / (norms[i] * norms[j])
        for i in corpus
        for j in corpus
    }
    chosen, expect = [], []
    remaining = list(order)
    while remaining and len(chosen) < k:
        scores = {
            i: lam * rel[i]
            - (1.0 - lam) * (max(sim[(i, c)] for c in chosen) if chosen else 0.0)
            for i in remaining
        }
        pick = min(remaining, key=lambda i: (-scores[i], i))
        expect.append(
            (len(chosen) + 1, pick, float(round(rel[pick], 9)), float(round(scores[pick], 9)))
        )
        chosen.append(pick)
        remaining.remove(pick)
    assert got == expect
    # at diversity-heavy lambda the duplicate of the first pick defers
    assert got[0][1] == 10 and got[1][1] == 12
