"""Semantic pins for the round-8 continuation operators beyond their
DuckDB oracles: Markov transition normalization and (ts, event_id)
ordering, rolling z-score window semantics (history exclusion, min-
history gate, spike detection), exact order-statistic selection in the
inter-arrival profile, the concentration scalars on hand-computable
distributions, centroid geometry on constructed classes, and RRF fusion
arithmetic (arm-missing handling, k-damping, tie order)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from eth_event_tracker_spark.operators.profile import concentration_profile
from eth_event_tracker_spark.operators.retrieval import rrf_fuse
from eth_event_tracker_spark.operators.similarity import label_centroid_cosines
from eth_event_tracker_spark.queries.streams import (
    interarrival,
    rate_anomalies,
    transition_matrix,
)

T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    """rows: (event_id, seconds_offset, user_id, event_type)"""
    data = [(eid, T0 + dt.timedelta(seconds=s), uid, et) for eid, s, uid, et in rows]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string"
    )


# ---------------------------------------------------------------------------
# transition_matrix
# ---------------------------------------------------------------------------
def test_transitions_counts_and_rows_normalize(spark):
    """user 1: a→b→a, user 2: a→c — from-'a' row splits 0.5/0.5; rows sum
    to 1 per from_type; no cross-user transition is invented."""
    ev = _events(
        spark,
        [(1, 0, 1, "a"), (2, 10, 1, "b"), (3, 20, 1, "a"), (4, 0, 2, "a"), (5, 10, 2, "c")],
    )
    got = {(r.from_type, r.to_type): (r.n, r.p) for r in transition_matrix(ev).collect()}
    assert got == {
        ("a", "b"): (1, 0.5),
        ("a", "c"): (1, 0.5),
        ("b", "a"): (1, 1.0),
    }


def test_transitions_order_breaks_ts_ties_by_event_id(spark):
    """Two same-timestamp events order by event_id: the sequence is
    a(1)→b(2), never b→a."""
    ev = _events(spark, [(2, 0, 1, "b"), (1, 0, 1, "a")])
    got = {(r.from_type, r.to_type) for r in transition_matrix(ev).collect()}
    assert got == {("a", "b")}


# ---------------------------------------------------------------------------
# rate_anomalies
# ---------------------------------------------------------------------------
def _hourly_events(spark, counts: list[int], etype: str = "x"):
    """counts[i] events inside hour i."""
    rows = []
    eid = 0
    for hr, c in enumerate(counts):
        for j in range(c):
            rows.append((eid, hr * 3600 + j, 1, etype))
            eid += 1
    return _events(spark, rows)


def test_rate_anomaly_flags_planted_spike(spark):
    """12 calm hours (alternating 10/12) then a 100-event hour: the spike
    hour is the only anomaly, with the hand-computed z."""
    calm = [10, 12] * 6
    ev = _hourly_events(spark, calm + [100])
    rows = rate_anomalies(ev, trailing=24, min_hist=12).collect()
    assert len(rows) == 1  # only the spike hour has >= 12 history buckets
    r = rows[0]
    s, ss, cnt = sum(calm), sum(c * c for c in calm), len(calm)
    mean = s / cnt
    var = (ss - s * s / cnt) / (cnt - 1)
    assert r.n == 100 and r.is_anomaly
    assert r.z_score == pytest.approx((100 - mean) / math.sqrt(var), abs=1e-9)
    assert r.trailing_mean == pytest.approx(mean, abs=1e-9)


def test_rate_anomaly_current_hour_excluded_from_window(spark):
    """The frame ends at 1 PRECEDING: a spike inflates neither its own
    mean nor its own variance — with the spike included the z would be
    tiny, excluded it is huge."""
    calm = [10, 12] * 6
    ev = _hourly_events(spark, calm + [100])
    r = rate_anomalies(ev, trailing=24, min_hist=12).collect()[0]
    assert r.trailing_mean == pytest.approx(sum(calm) / len(calm), abs=1e-9)  # no 100 in it


def test_rate_anomaly_min_history_gate(spark):
    """Hours with fewer than min_hist trailing buckets emit nothing —
    11 calm hours + spike is below the 12-bucket gate."""
    ev = _hourly_events(spark, [10, 12] * 5 + [11, 100])
    assert rate_anomalies(ev, trailing=24, min_hist=12).count() == 0


def test_rate_anomaly_zero_variance_dropped(spark):
    """A constant-rate history has no scale to score against: dropped,
    not a division-by-zero NULL/inf row."""
    ev = _hourly_events(spark, [10] * 12 + [50])
    assert rate_anomalies(ev, trailing=24, min_hist=12).count() == 0


# ---------------------------------------------------------------------------
# interarrival
# ---------------------------------------------------------------------------
def test_interarrival_exact_order_statistics(spark):
    """Gaps 1..10 seconds (n=10 even): median = (5e6+6e6)/2, p90 = the
    rank-9 gap, mean = floor(55e6/10)."""
    offsets = [0]
    for g in range(1, 11):
        offsets.append(offsets[-1] + g)
    ev = _events(spark, [(i, s, 1, "x") for i, s in enumerate(offsets)])
    r = interarrival(ev).collect()[0]
    assert (r.n_gaps, r.min_us, r.max_us) == (10, 1_000_000, 10_000_000)
    assert r.mean_us == 55_000_000 // 10
    assert r.median_us == (5_000_000 + 6_000_000) / 2
    assert r.p90_us == 9_000_000  # ceil(0.9*10) = rank 9
    assert isinstance(r.mean_us, int)


def test_interarrival_odd_n_median_is_middle_value(spark):
    """n=3 gaps (2, 4, 100): median is exactly 4e6 (both middle ranks
    coincide), p90 = rank ceil(2.7) = 3 → the 100 s outlier."""
    ev = _events(spark, [(0, 0, 1, "x"), (1, 2, 1, "x"), (2, 6, 1, "x"), (3, 106, 1, "x")])
    r = interarrival(ev).collect()[0]
    assert r.median_us == 4_000_000.0
    assert r.p90_us == 100_000_000


def test_interarrival_gaps_within_type_only(spark):
    """Types interleave in time but gaps never cross types: each type's
    gaps come from its own (ts, event_id) sequence."""
    ev = _events(
        spark, [(0, 0, 1, "a"), (1, 1, 1, "b"), (2, 10, 1, "a"), (3, 21, 1, "b")]
    )
    got = {r.event_type: r.max_us for r in interarrival(ev).collect()}
    assert got == {"a": 10_000_000, "b": 20_000_000}


# ---------------------------------------------------------------------------
# concentration_profile
# ---------------------------------------------------------------------------
def test_concentration_uniform_distribution_scalars(spark):
    """4 equal groups: entropy = ln 4, HHI = 1/4, Gini = 0, cum_share
    steps 0.25/0.5/0.75/1.0."""
    df = spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(40)], "doc_id long, source string"
    )
    rows = concentration_profile(df, "source").collect()
    assert len(rows) == 4
    r = rows[0]
    assert r.entropy == pytest.approx(math.log(4), abs=1e-8)
    assert r.hhi == pytest.approx(0.25, abs=1e-9)
    assert r.gini == pytest.approx(0.0, abs=1e-9)
    assert sorted(x.cum_share for x in rows) == [0.25, 0.5, 0.75, 1.0]
    assert all(x.share == 0.25 and x.mass == 10 for x in rows)


def test_concentration_degenerate_single_group(spark):
    """One group holding everything: entropy 0, HHI 1, Gini 0."""
    df = spark.createDataFrame([(i, "only") for i in range(7)], "doc_id long, source string")
    r = concentration_profile(df, "source").collect()[0]
    assert (r.entropy, r.hhi, r.gini) == (0.0, 1.0, 0.0)
    assert (r.share, r.cum_share) == (1.0, 1.0)


def test_concentration_skew_and_weighted_mass(spark):
    """Masses (1, 1, 8) via a weight column: Gini matches the
    hand-computed Σ(2i−n−1)m_i/(n·M) = 14/30; cum_share curve leads with
    the heavy group."""
    df = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 8)], "id long, source string, w long"
    )
    rows = {r.source: r for r in concentration_profile(df, "source", weight_col="w").collect()}
    assert rows["c"].gini == pytest.approx(14 / 30, abs=1e-9)
    assert rows["c"].cum_share == 0.8 and rows["c"].share == 0.8
    assert rows["a"].cum_share == 0.9 and rows["b"].cum_share == 1.0  # desc-mass, then name


# ---------------------------------------------------------------------------
# label_centroid_cosines
# ---------------------------------------------------------------------------
def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_centroid_cosine_orthogonal_and_aligned(spark):
    """Label 0 on +x, label 1 on +y (orthogonal → cosine 0); label 2 also
    on +x (aligned with 0 → cosine 1)."""
    df = _emb(
        spark,
        [
            (0, [1.0, 0.0], 0),
            (1, [3.0, 0.0], 0),
            (2, [0.0, 2.0], 1),
            (3, [0.0, 4.0], 1),
            (4, [5.0, 0.0], 2),
        ],
    )
    got = {(r.label_a, r.label_b): r for r in label_centroid_cosines(df).collect()}
    assert got[(0, 1)].cosine == pytest.approx(0.0, abs=1e-9)
    assert got[(0, 2)].cosine == pytest.approx(1.0, abs=1e-8)
    assert got[(0, 1)].n_a == 2 and got[(0, 1)].n_b == 2
    assert got[(0, 2)].norm_a == pytest.approx(2.0, abs=1e-8)  # centroid (2, 0)
    assert got[(0, 2)].norm_b == pytest.approx(5.0, abs=1e-8)


def test_centroid_cancellation_shrinks_norm(spark):
    """A label whose members oppose each other has a near-zero centroid
    norm — the 'no common direction' signal the monitor exists for."""
    df = _emb(
        spark,
        [(0, [1.0, 0.0], 0), (1, [-1.0, 0.0], 0), (2, [0.0, 1.0], 1), (3, [0.0, 1.0], 1)],
    )
    r = label_centroid_cosines(df).collect()[0]
    assert r.norm_a == pytest.approx(0.0, abs=1e-8)
    assert r.norm_b == pytest.approx(1.0, abs=1e-8)
    assert r.cosine is None  # portable NULL on a zero-norm centroid


# ---------------------------------------------------------------------------
# rrf_fuse
# ---------------------------------------------------------------------------
def _ranked(spark, ids_in_order):
    return spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(ids_in_order)], "doc_id long, rank long"
    )


def test_rrf_consensus_beats_single_arm_top(spark):
    """Doc 30 is rank 2 in BOTH arms and must out-fuse docs 10/20 that
    top one arm but miss the other: 2/(60+2) > 1/(60+1)."""
    lex = _ranked(spark, [10, 30, 11])
    vec = _ranked(spark, [20, 30, 21])
    rows = rrf_fuse({"lex": lex, "vec": vec}, top_n=10).collect()
    assert rows[0].doc_id == 30
    assert rows[0].rrf_score == pytest.approx(2 / 62, abs=1e-9)
    assert rows[0].lex_rank == 2 and rows[0].vec_rank == 2
    one_arm = {r.doc_id: r for r in rows[1:]}
    assert one_arm[10].vec_rank is None and one_arm[10].rrf_score == pytest.approx(1 / 61, abs=1e-9)


def test_rrf_equal_scores_order_by_id(spark):
    """Docs with identical fused scores order ascending by id — the
    deterministic tie the oracle hash depends on."""
    lex = _ranked(spark, [7, 5])
    vec = _ranked(spark, [5, 7])
    rows = rrf_fuse({"lex": lex, "vec": vec}, top_n=10).collect()
    assert [r.doc_id for r in rows] == [5, 7]


def test_rrf_k_damps_rank_gaps(spark):
    """With k=0 rank 1 vs 2 differ 2×; with k=60 the same gap is ~1.6% —
    pin both so the damping constant is load-bearing, not decorative."""
    lex = _ranked(spark, [1, 2])
    r0 = {r.doc_id: r.rrf_score for r in rrf_fuse({"lex": lex}, k=0, top_n=10).collect()}
    r60 = {r.doc_id: r.rrf_score for r in rrf_fuse({"lex": lex}, k=60, top_n=10).collect()}
    # scores round to 9dp before the ratio, so the pin is 1e-6
    assert r0[1] / r0[2] == pytest.approx(2.0, abs=1e-6)
    assert r60[1] / r60[2] == pytest.approx(62 / 61, abs=1e-6)


def test_rrf_top_n_bounds_output(spark):
    lex = _ranked(spark, list(range(100, 140)))
    assert rrf_fuse({"lex": lex}, top_n=5).count() == 5


# ---------------------------------------------------------------------------
# changepoint_cusum
# ---------------------------------------------------------------------------
def test_cusum_planted_level_shift(spark):
    """10 hours at rate 10 then 10 at rate 20: μ=15, C_t = −5t on the low
    segment → |C| peaks at the last low hour with C = −50; before/after
    means recover the two levels exactly."""
    from eth_event_tracker_spark.queries.streams import changepoint_cusum

    ev = _hourly_events(spark, [10] * 10 + [20] * 10)
    r = changepoint_cusum(ev).collect()[0]
    assert r.change_hour == T0 + dt.timedelta(hours=9)
    assert r.cusum == -50.0
    assert r.mean_before == 10.0 and r.mean_after == 20.0
    assert r.n_buckets == 20


def test_cusum_excludes_last_bucket(spark):
    """With 2 buckets only t=1 is a candidate (the after-segment must be
    non-empty) — no division-by-zero row, exactly one output row."""
    from eth_event_tracker_spark.queries.streams import changepoint_cusum

    ev = _hourly_events(spark, [5, 50])
    rows = changepoint_cusum(ev).collect()
    assert len(rows) == 1 and rows[0].change_hour == T0
    assert rows[0].mean_before == 5.0 and rows[0].mean_after == 50.0


# ---------------------------------------------------------------------------
# dim_variance_profile
# ---------------------------------------------------------------------------
def test_dim_variance_hand_computed(spark):
    """Vectors (0,1) and (0,3): dim 0 is dead (mean 0, var 0); dim 1 has
    mean 2, sample var 2."""
    from eth_event_tracker_spark.operators.similarity import dim_variance_profile

    df = _emb(spark, [(0, [0.0, 1.0], 0), (1, [0.0, 3.0], 0)])
    got = {r.dim: r for r in dim_variance_profile(df).collect()}
    assert got[0].mean == 0.0 and got[0].var == 0.0
    assert got[1].mean == 2.0 and got[1].var == 2.0
    assert got[0].n == 2


# ---------------------------------------------------------------------------
# mmr_rerank
# ---------------------------------------------------------------------------
def test_mmr_first_pick_is_top_relevance(spark):
    from eth_event_tracker_spark.operators.similarity import mmr_rerank

    q = _emb(spark, [(0, [1.0, 0.0], 0)])
    c = _emb(spark, [(10, [1.0, 0.0], 0), (11, [0.9, 0.1], 0), (12, [0.6, 0.8], 0)])
    rows = mmr_rerank(q, c, k=3, fetch_k=10, lam=0.3).collect()
    assert rows[0].rank == 1 and rows[0].c_id == 10 and rows[0].relevance == 1.0


def test_mmr_defers_near_duplicate(spark):
    """Candidate 11 is nearly a copy of the first pick; at λ=0.3 the
    diverse candidate 12 outranks it despite lower relevance — the
    exact behavior pure relevance ranking cannot produce."""
    from eth_event_tracker_spark.operators.similarity import mmr_rerank

    q = _emb(spark, [(0, [1.0, 0.0], 0)])
    c = _emb(spark, [(10, [1.0, 0.0], 0), (11, [0.9, 0.1], 0), (12, [0.6, 0.8], 0)])
    order = [r.c_id for r in mmr_rerank(q, c, k=3, fetch_k=10, lam=0.3).collect()]
    assert order == [10, 12, 11]
    # pure relevance would rank 11 ahead of 12
    rel_order = [r.c_id for r in mmr_rerank(q, c, k=3, fetch_k=10, lam=1.0).collect()]
    assert rel_order == [10, 11, 12]


def test_mmr_lambda_one_equals_relevance_order(spark, sf_dir):
    """λ=1 degenerates to the exact cosine top-k order on the fixture."""
    from eth_event_tracker_spark.operators.similarity import cosine_topk_exact, mmr_rerank
    from eth_event_tracker_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 2)
    c = emb.where(F.col("vec_id") >= 5)
    exact = {
        (r.q_id, r.rank): r.c_id
        for r in cosine_topk_exact(q, c, k=5).collect()
    }
    mmr = {
        (r.q_id, r.rank): r.c_id
        for r in mmr_rerank(q, c, k=5, fetch_k=20, lam=1.0).collect()
    }
    assert mmr == exact


# ---------------------------------------------------------------------------
# rfm_segments
# ---------------------------------------------------------------------------
def test_rfm_scores_separate_planted_extremes(spark):
    """5 users with strictly increasing recency/frequency/monetary land in
    5 distinct quintiles each; the best user scores (5,5,5), the worst
    (1,1,1)."""
    from eth_event_tracker_spark.queries.streams import rfm_segments

    rows = []
    eid = 0
    for u in range(5):
        # user u: u+1 events, last at day u (user 4 most recent), value 10*(u+1)
        for j in range(u + 1):
            rows.append((eid, u * 86400 + j, u, "buy"))
            eid += 1
    ev = _events(spark, rows).withColumn("value", (F.col("user_id") + 1) * 10.0)
    segs = rfm_segments(ev).collect()
    by_cell = {(r.r_score, r.f_score, r.m_score): r for r in segs}
    assert (5, 5, 5) in by_cell and by_cell[(5, 5, 5)].n_users == 1
    assert (1, 1, 1) in by_cell and by_cell[(1, 1, 1)].n_users == 1
    assert by_cell[(5, 5, 5)].avg_recency_days == 0.0  # user 4 active at ref time
    assert by_cell[(1, 1, 1)].avg_recency_days == 4.0
    assert sum(r.n_users for r in segs) == 5


def test_rfm_recency_is_whole_days_floor(spark):
    """23h59m before the reference is 0 days, 24h01m is 1 day — floor
    division on exact microseconds, no timezone/rounding drift."""
    from eth_event_tracker_spark.queries.streams import rfm_segments

    ev = _events(
        spark,
        [(0, 0, 1, "x"), (1, 86400 + 60, 2, "x"), (2, 2 * 86400 + 120, 3, "x")],
    ).withColumn("value", F.lit(1.0))
    # ref = user 3's ts; user 2 is 1d1m older -> 1 day; user 1 is ~2 days -> 2
    segs = rfm_segments(ev).collect()
    recs = sorted(r.avg_recency_days for r in segs)
    assert recs == [0.0, 1.0, 2.0]


# ---------------------------------------------------------------------------
# lexical_diversity
# ---------------------------------------------------------------------------
def test_lexical_diversity_hand_computed(spark):
    """'a a a b' → 4 tokens, 2 types, ttr 0.5, hapax {b} → share 0.5;
    a same-group second doc extends the group vocabulary, not per-doc."""
    from eth_event_tracker_spark.operators.text import lexical_diversity

    df = spark.createDataFrame(
        [(1, "a a a b", "s1"), (2, "c c", "s2")],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in lexical_diversity(df).collect()}
    assert (got["s1"].n_tokens, got["s1"].n_types) == (4, 2)
    assert got["s1"].ttr == 0.5 and got["s1"].hapax_share == 0.5
    assert got["s1"].hapax_types == 1
    assert (got["s2"].n_tokens, got["s2"].n_types, got["s2"].hapax_types) == (2, 1, 0)


def test_lexical_diversity_pools_group_not_doc(spark):
    """A word unique within each doc but shared across two same-source
    docs is NOT a hapax at the group level — the stat is corpus-pooled."""
    from eth_event_tracker_spark.operators.text import lexical_diversity

    df = spark.createDataFrame(
        [(1, "shared alpha", "s"), (2, "shared beta", "s")],
        "doc_id long, text string, source string",
    )
    r = lexical_diversity(df).collect()[0]
    assert r.n_types == 3 and r.hapax_types == 2  # alpha, beta; 'shared' cnt=2


def test_lexical_diversity_template_farm_low_ttr(spark):
    """100 copies of one template vs 1 unique doc: the template group's
    TTR collapses, the diverse group's stays 1.0 — the signal the
    operator exists to surface."""
    from eth_event_tracker_spark.operators.text import lexical_diversity

    rows = [(i, "buy now limited offer", "farm") for i in range(100)]
    rows.append((1000, "quaint zephyrs vex bold jim", "prose"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in lexical_diversity(df).collect()}
    assert got["farm"].ttr == pytest.approx(4 / 400, abs=1e-9)
    assert got["prose"].ttr == 1.0 and got["prose"].hapax_share == 1.0


# ---------------------------------------------------------------------------
# conversion_latency
# ---------------------------------------------------------------------------
def test_conversion_latency_hand_computed(spark):
    """Three converting users with latencies 10/20/100 s: median 20 s,
    mean floor(130/3) s; a purchase BEFORE any view does not convert;
    a view-only user contributes nothing."""
    from eth_event_tracker_spark.queries.streams import conversion_latency

    ev = _events(
        spark,
        [
            (0, 0, 1, "view"), (1, 10, 1, "purchase"),
            (2, 0, 2, "view"), (3, 20, 2, "purchase"),
            (4, 0, 3, "view"), (5, 100, 3, "purchase"),
            (6, 50, 4, "purchase"), (7, 60, 4, "view"),   # purchase precedes view
            (8, 0, 5, "view"),                              # never purchases
        ],
    )
    r = conversion_latency(ev, "view", "purchase").collect()[0]
    assert r.n_converted == 3
    assert r.median_us == 20_000_000.0
    assert r.mean_us == 130_000_000 // 3
    assert (r.min_us, r.max_us) == (10_000_000, 100_000_000)


def test_conversion_latency_uses_first_view_and_first_qualifying_purchase(spark):
    """Two views and two purchases: latency runs from the FIRST view to
    the first purchase at-or-after it, not between nearest pairs."""
    from eth_event_tracker_spark.queries.streams import conversion_latency

    ev = _events(
        spark,
        [(0, 0, 1, "view"), (1, 5, 1, "view"), (2, 30, 1, "purchase"), (3, 99, 1, "purchase")],
    )
    r = conversion_latency(ev, "view", "purchase").collect()[0]
    assert r.n_converted == 1 and r.max_us == 30_000_000


# ---------------------------------------------------------------------------
# dedup_savings_by_source
# ---------------------------------------------------------------------------
def test_dedup_savings_counts_planted_duplicates(spark, sf_dir):
    """The registry corpus re-injects every doc_id % 10 == 0 doc under a
    shifted id: each source's removed-doc count equals its count of such
    docs, keepers always win (kept = docs + 0 extra), and token savings
    equals the duplicated docs' token share."""
    from eth_event_tracker_spark.queries.llmdata import dedup_savings_by_source
    from eth_event_tracker_spark.tables import load_table

    rows = {r.source: r for r in dedup_savings_by_source(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source").collect()
    import collections

    n_by_src = collections.Counter(d.source for d in docs)
    dup_by_src = collections.Counter(d.source for d in docs if d.doc_id % 10 == 0)
    for src, r in rows.items():
        assert r.n_docs == n_by_src[src] + dup_by_src[src]
        assert r.n_removed == dup_by_src[src]
        assert r.n_kept == n_by_src[src]
        assert r.raw_tokens > r.kept_tokens or dup_by_src[src] == 0
        if dup_by_src[src] == 0:
            assert r.token_savings == 0.0


def test_dedup_savings_zero_for_duplicate_free_source(spark):
    """A constructed corpus with no cross-copies reports zero savings —
    over the operator's own Spark path via a temp view is overkill; pin
    the semantics on the SQL-equivalent planted frame instead."""
    from pyspark.sql import functions as F
    from eth_event_tracker_spark.operators.text import normalize, words

    # direct re-implementation of the marking logic over a unique corpus:
    df = spark.createDataFrame(
        [(1, "alpha beta", "s"), (2, "gamma delta", "s")], "doc_id long, text string, source string"
    )
    hashed = df.select(
        "doc_id", "source", F.sha2(normalize(F.col("text")), 256).alias("h"),
        F.size(words(F.col("text"))).alias("n_tok"),
    )
    from pyspark.sql import Window as W

    kept = hashed.select(
        (F.col("doc_id") == F.min("doc_id").over(W.partitionBy("h"))).cast("int").alias("kept")
    )
    assert [r.kept for r in kept.collect()] == [1, 1]


# ---------------------------------------------------------------------------
# seasonal_anomalies
# ---------------------------------------------------------------------------
def test_seasonal_anomaly_ignores_daily_peak_flags_break(spark):
    """9 days with a big-but-regular 9am peak plus one day where 9am
    triples: the regular peaks score ~0 (same-hour history explains
    them), only the broken day is anomalous — exactly what the trailing-
    window detector cannot do."""
    from eth_event_tracker_spark.queries.streams import seasonal_anomalies

    rows, eid = [], 0
    for day in range(10):
        for hod, base in ((9, 100), (15, 10)):
            n = base
            if day % 2 and hod == 9:
                n = base + 2  # mild jitter so variance > 0
            if day % 2 and hod == 15:
                n = base + 1
            if day == 9 and hod == 9:
                n = 300  # the break (after jitter so it is never overwritten)
            for j in range(n):
                rows.append((eid, day * 86400 + hod * 3600 + j, 1, "x"))
                eid += 1
    ev = _events(spark, rows)
    out = seasonal_anomalies(ev, min_group=9).collect()
    anom = [r for r in out if r.is_anomaly]
    assert len(anom) == 1
    assert anom[0].hod == 9 and anom[0].n == 300
    # the regular 9am peaks are NOT anomalous despite being 10x the 3pm rate
    nines = [r for r in out if r.hod == 9 and r.n in (100, 102)]
    assert nines and all(not r.is_anomaly for r in nines)


def test_seasonal_anomaly_leave_one_out_excludes_self(spark):
    """The spike's own count appears in neither its mean nor variance:
    seasonal_mean for the 300-count bucket equals the mean of the other
    nine 9am buckets exactly."""
    from eth_event_tracker_spark.queries.streams import seasonal_anomalies

    rows, eid = [], 0
    counts = [100, 102, 100, 102, 100, 102, 100, 102, 100, 300]
    for day, n in enumerate(counts):
        for j in range(n):
            rows.append((eid, day * 86400 + 9 * 3600 + j, 1, "x"))
            eid += 1
    ev = _events(spark, rows)
    r = [x for x in seasonal_anomalies(ev, min_group=9).collect() if x.n == 300][0]
    assert r.seasonal_mean == pytest.approx(sum(counts[:9]) / 9, abs=1e-9)


# ---------------------------------------------------------------------------
# journey_surprise
# ---------------------------------------------------------------------------
def test_journey_surprise_rare_path_ranks_first(spark):
    """20 users walk a>b>c>d; one user walks a>c>b>d (transitions the
    model has barely seen): the deviant ranks first with the
    hand-computed e9-quantized mean log-probability."""
    from eth_event_tracker_spark.queries.streams import journey_surprise

    rows, eid = [], 0
    for u in range(20):
        for i, et in enumerate("abcd"):
            rows.append((eid, i, u, et)); eid += 1
    for i, et in enumerate("acbd"):
        rows.append((eid, i, 99, et)); eid += 1
    ev = _events(spark, rows)
    out = journey_surprise(ev, min_transitions=3, top=5).collect()
    assert out[0].user_id == 99 and out[0].n_transitions == 3

    def lp(nft, nf):
        return round(math.log(nft) * 1e9) - round(math.log(nf) * 1e9)

    # model counts: a>b 20, a>c 1 (n_a=21); b>c 20, b>d 1 (n_b=21);
    # c>d 20, c>b 1 (n_c=21)
    want = round((lp(1, 21) + lp(1, 21) + lp(1, 21)) / 3 / 1e9, 9)
    assert out[0].mean_lp == want
    # the common path's users all share the (higher) common likelihood
    assert all(r.mean_lp > out[0].mean_lp for r in out[1:])


def test_journey_surprise_min_transitions_gate(spark):
    """A 2-event user (1 transition) never appears at min_transitions=3."""
    from eth_event_tracker_spark.queries.streams import journey_surprise

    rows = [(0, 0, 1, "a"), (1, 1, 1, "b")]
    rows += [(10 + i, i, 2, t) for i, t in enumerate("abab")]
    ev = _events(spark, rows)
    users = {r.user_id for r in journey_surprise(ev, min_transitions=3, top=10).collect()}
    assert users == {2}


# ---------------------------------------------------------------------------
# dedup_precision_minhash
# ---------------------------------------------------------------------------
def test_precision_monitor_coheres_with_verified_pairs(spark, sf_dir):
    """n_true = |candidates ∩ exact pairs| must equal the verified-pair
    count the full LSH dedup pipeline emits (same banding, same
    threshold), and precision = n_true / n_cand exactly."""
    from eth_event_tracker_spark.operators import dedup as OPD
    from eth_event_tracker_spark.queries.llmdata import (
        _doc_shingles,
        dedup_precision_minhash,
    )
    from eth_event_tracker_spark.tables import load_table

    r = dedup_precision_minhash(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents")
    sh = _doc_shingles(spark, sf_dir)
    verified = OPD.minhash_lsh_dedup(docs, threshold=0.8, shingles=sh).count()
    assert r.n_true == verified
    assert 0 <= r.n_true <= r.n_cand
    if r.n_cand:
        assert r.band_precision == pytest.approx(r.n_true / r.n_cand, abs=1e-12)


# ---------------------------------------------------------------------------
# benford_digits
# ---------------------------------------------------------------------------
def test_benford_digit_extraction_and_grid_fill(spark):
    """Amounts 1.23 / 0.05 / 900.00 yield first digits 1, 5, 9 from
    cents (123, 5, 90000); the other six digits appear with n_obs=0 via
    the grid fill; non-positive amounts are excluded."""
    from eth_event_tracker_spark.queries.relational import benford_digits

    df = spark.createDataFrame(
        [(1.23,), (0.05,), (900.0,), (0.0,), (-7.0,)], "amt double"
    )
    rows = {r.digit: r for r in benford_digits(df, "amt").collect()}
    assert set(rows) == set(range(1, 10))
    assert rows[1].n_obs == 1 and rows[5].n_obs == 1 and rows[9].n_obs == 1
    assert all(rows[d].n_obs == 0 for d in (2, 3, 4, 6, 7, 8))
    assert rows[1].obs_p == pytest.approx(1 / 3, abs=1e-9)


def test_benford_conforming_sample_scores_low_uniform_high(spark):
    """A geometric (Benford-conforming) amount sample scores a far lower
    chi2 than a same-size uniform-first-digit sample — the separation
    the forensic screen exists for."""
    from eth_event_tracker_spark.queries.relational import benford_digits

    # 9000 geometric amounts: 10^(u) for u dense in [0, 3) -> Benford
    geo = [(10.0 ** (3 * i / 9000.0),) for i in range(9000)]
    uni = [((d + 0.5) * 10.0,) for d in range(1, 10) for _ in range(1000)]
    chi_geo = benford_digits(spark.createDataFrame(geo, "amt double"), "amt").first().chi2
    chi_uni = benford_digits(spark.createDataFrame(uni, "amt double"), "amt").first().chi2
    assert chi_geo < 50 < 1000 < chi_uni


# ---------------------------------------------------------------------------
# seasonality_acf
# ---------------------------------------------------------------------------
def test_acf_perfect_daily_cycle_is_one(spark):
    """A count series that repeats exactly every 24h has acf24 = 1."""
    from eth_event_tracker_spark.queries.streams import seasonality_acf

    rows, eid = [], 0
    pattern = [5, 9, 3, 7] * 6  # 24 hourly counts
    for day in range(4):
        for hod, n in enumerate(pattern):
            for j in range(n):
                rows.append((eid, day * 86400 + hod * 3600 + j, 1, "x"))
                eid += 1
    ev = _events(spark, rows)
    r = seasonality_acf(ev).collect()[0]
    assert r.acf24 == 1.0
    assert r.n_pairs == 72  # 3 days of aligned pairs


def test_acf_alignment_is_by_timestamp_not_row(spark):
    """A missing hour must not shift the alignment: drop one bucket from
    an exact daily cycle and acf24 stays 1 (a rows-frame lag would
    smear the series and drop below 1)."""
    from eth_event_tracker_spark.queries.streams import seasonality_acf

    rows, eid = [], 0
    pattern = [5, 9, 3, 7] * 6
    for day in range(4):
        for hod, n in enumerate(pattern):
            if day == 1 and hod == 10:
                continue  # gap hour
            for j in range(n):
                rows.append((eid, day * 86400 + hod * 3600 + j, 1, "x"))
                eid += 1
    ev = _events(spark, rows)
    r = seasonality_acf(ev).collect()[0]
    assert r.acf24 == 1.0  # pairs touching the gap vanish; alignment holds


def test_acf_constant_series_is_null(spark):
    """Zero variance -> NULL, not a crash or a fake 1.0."""
    from eth_event_tracker_spark.queries.streams import seasonality_acf

    rows = []
    eid = 0
    for hr in range(48):
        for j in range(5):
            rows.append((eid, hr * 3600 + j, 1, "x")); eid += 1
    ev = _events(spark, rows)
    r = seasonality_acf(ev).collect()[0]
    assert r.acf24 is None and r.n_pairs == 24


# ---------------------------------------------------------------------------
# cosine_near_dup_pairs_lsh exact-duplicate collapse
# ---------------------------------------------------------------------------
def test_near_dup_lsh_collapse_is_bit_equal(spark, sf_dir):
    """The exact-duplicate pre-collapse (on by default) must emit the
    bit-identical pair set of the uncollapsed bucketed join, on a
    duplicate-heavy corpus (3x replicated embeddings) — the sf≈1.0
    density fix cannot change semantics."""
    from eth_event_tracker_spark.operators.similarity import cosine_near_dup_pairs_lsh
    from eth_event_tracker_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dup = emb
    for shift in (100000, 200000):
        dup = dup.unionByName(
            emb.select((F.col("vec_id") + shift).alias("vec_id"), "embedding", "label")
        )
    a = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in cosine_near_dup_pairs_lsh(dup, threshold=0.3, n_planes=6).collect()
    )
    b = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in cosine_near_dup_pairs_lsh(
            dup, threshold=0.3, n_planes=6, collapse_exact=False
        ).collect()
    )
    assert a == b and len(a) > 0
    # every 3-way duplicate family contributes its 3 intra pairs
    first = emb.select(F.min("vec_id")).first()[0]
    fam = {p for p in a if {p[0], p[1]} <= {first, first + 100000, first + 200000}}
    assert len(fam) == 3
