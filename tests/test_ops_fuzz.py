"""Property fuzz for the round-7 operators, each against an
independent pure-python reference implementing the documented
semantics from scratch (not the Spark plan re-expressed):
duplicate_spans, kmv_set_sizes, winsorize_tukey's approx tier."""

from __future__ import annotations


import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from eth_event_tracker_spark.operators.dedup import duplicate_spans
from eth_event_tracker_spark.operators.profile import winsorize_tukey
from eth_event_tracker_spark.operators.sketches import kmv_profile, kmv_set_sizes

# tiny alphabet → shared n-grams arise constantly, including partial
# overlaps and intra-doc repeats
WORD = st.sampled_from(["aa", "bb", "cc", "dd"])
DOC = st.lists(WORD, min_size=0, max_size=24)
CORPUS = st.lists(DOC, min_size=2, max_size=7)

N = 3  # n-gram width under fuzz


def _py_spans(texts: list[list[str]], n: int, min_docs: int = 2):
    """Reference: sliding n-grams, cross-doc duplicated positions,
    gaps-and-islands merge."""
    grams: dict[tuple[str, ...], set[int]] = {}
    pos: dict[int, list[int]] = {}
    for d, ws in enumerate(texts):
        for p in range(len(ws) - n + 1):
            grams.setdefault(tuple(ws[p : p + n]), set()).add(d)
    dup = {g for g, docs in grams.items() if len(docs) >= min_docs}
    for d, ws in enumerate(texts):
        hits = [p for p in range(len(ws) - n + 1) if tuple(ws[p : p + n]) in dup]
        if hits:
            pos[d] = hits
    out = set()
    for d, hits in pos.items():
        start = prev = hits[0]
        cnt = 1
        for p in hits[1:]:
            if p == prev + 1:
                prev = p
                cnt += 1
            else:
                out.add((d, start, prev + n - 1, prev + n - start, cnt))
                start = prev = p
                cnt = 1
        out.add((d, start, prev + n - 1, prev + n - start, cnt))
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(CORPUS)
def test_duplicate_spans_matches_python_reference(spark, corpus):
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_words"], r["n_grams"])
        for r in duplicate_spans(df, n=N).collect()
    }
    assert got == _py_spans(corpus, N)


def _h60(s: str) -> int:
    from eth_event_tracker_spark.functions.hashing import hash60_py

    return hash60_py(s, 0)


SETS = st.lists(
    st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=40),
    min_size=2,
    max_size=4,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(SETS, st.sampled_from([4, 8, 256]))
def test_kmv_set_sizes_matches_python_reference(spark, groups, k):
    rows = [(chr(97 + g), v) for g, vs in enumerate(groups) for v in vs]
    if not rows:
        return
    df = spark.createDataFrame(rows, "g string, item string")
    sk = kmv_profile(df, ["g"], "item", k=k)
    got = {
        (r["group_a"], r["group_b"]): (r["jaccard_est"], r["union_est"], r["inter_est"])
        for r in kmv_set_sizes(sk, "g", k=k).collect()
    }

    # python reference from the same documented sketch definition
    hsets = {
        chr(97 + g): {_h60(str(v)) for v in vs} for g, vs in enumerate(groups) if vs
    }
    sketches = {g: set(sorted(hs)[:k]) for g, hs in hsets.items()}
    want = {}
    names = sorted(sketches)
    for i, ga in enumerate(names):
        for gb in names[i + 1 :]:
            uni = sorted(sketches[ga] | sketches[gb])[:k]
            j = sum(1 for h in uni if h in sketches[ga] and h in sketches[gb]) / len(uni)
            u = float(len(uni)) if len(uni) < k else (k - 1) * 1152921504606846976.0 / uni[-1]
            want[(ga, gb)] = (j, u, j * u)
    assert set(got) == set(want)
    for pair in want:
        for a, b in zip(got[pair], want[pair]):
            assert a == pytest.approx(b, rel=1e-12), (pair, got[pair], want[pair])


def test_winsorize_approx_tier_equals_exact_on_fixture(spark):
    """approx_percentile returns corpus ELEMENTS (nearest rank), never
    interpolations — so the approx tier equals the exact tier exactly
    when the quartile positions (n−1)·{0.25, 0.75} are integers
    (n = 4m+1 per group).  The same pin the MAD approx tier carries;
    guards the flag actually switching implementations without
    changing semantics where they must agree."""
    rows = [("g1", float(v)) for v in range(1, 29)] + [
        ("g1", 500.0),  # n = 29 → quartiles land on elements 7 and 21
        ("g2", 7.0),
        ("g2", None),
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    cols = ["g", "v", "lo_fence", "hi_fence", "clipped"]
    exact = winsorize_tukey(df, "g", "v", approx=False).select(cols).orderBy("g", "v")
    approx = winsorize_tukey(df, "g", "v", approx=True).select(cols).orderBy("g", "v")
    assert [r.asDict() for r in exact.collect()] == [
        r.asDict() for r in approx.collect()
    ]


class TestZipfProfile:
    def test_planted_zipf_slope_near_minus_one(self, spark):
        from eth_event_tracker_spark.operators.profile import zipf_profile

        # term t_r appears round(1000/r) times -> ln f = ln 1000 - ln r,
        # an exact slope of -1 up to the harmonic rounding
        words = []
        for r in range(1, 60):
            words += [f"t{r:03d}"] * round(1000 / r)
        df = spark.createDataFrame(
            [("zipf", " ".join(words))], "source string, text string"
        )
        (row,) = zipf_profile(df, top_r=50).collect()
        assert row["n"] == 50
        assert abs(row["slope"] + 1.0) < 0.05, row
        # intercept ~ ln(1000)
        import math

        assert abs(row["intercept"] - math.log(1000)) < 0.2, row

    def test_uniform_corpus_slope_near_zero(self, spark):
        from eth_event_tracker_spark.operators.profile import zipf_profile

        words = [f"u{r}" for r in range(50)] * 20  # every term 20x
        df = spark.createDataFrame(
            [("flat", " ".join(words))], "source string, text string"
        )
        (row,) = zipf_profile(df, top_r=50).collect()
        assert row["slope"] == 0.0, "identical frequencies -> flat fit"

    def test_groups_fit_independently_and_deterministic(self, spark):
        from eth_event_tracker_spark.operators.profile import zipf_profile

        zipf_words = []
        for r in range(1, 40):
            zipf_words += [f"t{r:03d}"] * round(400 / r)
        rows = [("z", " ".join(zipf_words)), ("f", " ".join([f"u{r}" for r in range(40)] * 5))]
        df = spark.createDataFrame(rows, "source string, text string")
        a = {r["source"]: (r["slope"], r["intercept"]) for r in zipf_profile(df.repartition(1), top_r=30).collect()}
        b = {r["source"]: (r["slope"], r["intercept"]) for r in zipf_profile(df.repartition(5), top_r=30).collect()}
        assert a == b
        assert a["f"][0] == 0.0 and a["z"][0] < -0.8


class TestKFoldSplit:
    def test_duplicates_share_fold_and_balance(self, spark):
        from eth_event_tracker_spark.operators.splits import kfold_split

        rows = [(i, f"unique text {i}") for i in range(200)]
        rows += [(1000 + i, "the same duplicated text") for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = kfold_split(df, k=5, coherence_col="text").collect()
        dup_folds = {r["fold"] for r in got if r["doc_id"] >= 1000}
        assert len(dup_folds) == 1, "exact duplicates must share one fold"
        from collections import Counter

        counts = Counter(r["fold"] for r in got)
        assert set(counts) <= set(range(5))
        assert min(counts.values()) >= 15, f"grossly unbalanced: {counts}"

    def test_fold_stable_under_corpus_growth(self, spark):
        from eth_event_tracker_spark.operators.splits import kfold_split

        small = spark.createDataFrame(
            [(i, f"t{i}") for i in range(50)], "doc_id long, text string"
        )
        grown = spark.createDataFrame(
            [(i, f"t{i}") for i in range(300)], "doc_id long, text string"
        )
        a = {r["doc_id"]: r["fold"] for r in kfold_split(small, k=7, coherence_col="text").collect()}
        b = {r["doc_id"]: r["fold"] for r in kfold_split(grown, k=7, coherence_col="text").collect()}
        assert all(b[d] == f for d, f in a.items()), (
            "growing the corpus must never move an existing row's fold"
        )

    def test_k_validation(self, spark):
        from eth_event_tracker_spark.operators.splits import kfold_split

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        import pytest as _p

        with _p.raises(ValueError, match="k must be"):
            kfold_split(df, k=1)


# ---------------------------------------------------------------------------
# Round-8 operators: BFS hop distances and containment pairs, each vs an
# independent pure-python model.
# ---------------------------------------------------------------------------
EDGE = st.tuples(st.integers(0, 11), st.integers(0, 11))


def _py_bfs(edges: list[tuple[int, int]], seeds: set[int], max_hops: int):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = {v for u in frontier for v in adj.get(u, ()) if v not in dist}
        for v in nxt:
            dist[v] = h
        if not nxt:
            break
        frontier = nxt
    return dist


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(EDGE, min_size=1, max_size=24), st.sets(st.integers(0, 11), min_size=1, max_size=3), st.integers(1, 5))
def test_bfs_matches_python_reference(spark, edges, seeds, max_hops):
    from eth_event_tracker_spark.operators.graph import bfs_hops

    df = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in sorted(seeds)], "v long")
    got = {r.node: r.hops for r in bfs_hops(df, sdf, max_hops=max_hops).collect()}
    assert got == _py_bfs(edges, seeds, max_hops)


def _py_containment(texts: list[list[str]], n: int, thr: float):
    # word_shingles semantics: docs shorter than n contribute their whole
    # text as ONE shingle (greatest(size-n, 0)); empty strings filtered
    sh = [
        {" ".join(t[i : i + n]) for i in range(max(len(t) - n, 0) + 1)} - {""}
        for t in texts
    ]
    out = {}
    for i in range(len(texts)):
        for j in range(len(texts)):
            if i == j or not sh[i]:
                continue
            c = len(sh[i] & sh[j]) / len(sh[i])
            if c >= thr:
                out[(i, j)] = c
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(CORPUS, st.sampled_from([0.3, 0.5, 0.8]))
def test_containment_matches_python_reference(spark, corpus, thr):
    from eth_event_tracker_spark.operators.dedup import containment_pairs

    docs = [(i, " ".join(t)) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(df, threshold=thr, n=N).collect()
    }
    assert got == pytest.approx(_py_containment(corpus, N, thr))


def _py_journeys(events, k, top):
    """Reference: per-user (ts, event_id)-ordered first-k render, path
    counts, (count desc, journey asc) order, top cut."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for uid, eid, ts, et in events:
        by_user[uid].append((ts, eid, et))
    paths = defaultdict(int)
    for evs in by_user.values():
        evs.sort()
        paths[">".join(e[2] for e in evs[:k])] += 1
    ranked = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:top]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 40), st.integers(0, 3), st.sampled_from("abc")),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[1],  # event_id unique — the total-order contract
    ),
    st.integers(1, 4),
)
def test_journey_paths_matches_python_reference(spark, rows, k):
    import datetime as dt

    from eth_event_tracker_spark.queries.streams import journey_paths

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(u, e, t0 + dt.timedelta(minutes=m), t) for u, e, m, t in rows],
        "user_id long, event_id long, ts timestamp, event_type string",
    )
    got = [(r.journey, r.n_users) for r in journey_paths(ev, k=k, top=50).collect()]
    expected = _py_journeys(
        [(u, e, t0 + dt.timedelta(minutes=m), t) for u, e, m, t in rows], k, 50
    )
    assert got == expected


def _py_boilerplate(texts, n, min_docs, top):
    from collections import defaultdict

    occ = defaultdict(int)
    docs = defaultdict(set)
    for i, t in enumerate(texts):
        if len(t) < n:
            continue
        for j in range(len(t) - n + 1):
            g = " ".join(t[j : j + n])
            occ[g] += 1
            docs[g].add(i)
    rows = [
        (g, len(docs[g]), occ[g], len(docs[g]) / len(texts))
        for g in occ
        if len(docs[g]) >= min_docs
    ]
    rows.sort(key=lambda r: (-r[1], -r[2], r[0]))
    return rows[:top]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=10), min_size=2, max_size=6))
def test_boilerplate_matches_python_reference(spark, corpus):
    from eth_event_tracker_spark.operators.text import ngram_boilerplate

    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = [
        (r.gram, r.n_docs, r.n_occ, r.doc_share)
        for r in ngram_boilerplate(df, n=3, min_docs=2, top=20).collect()
    ]
    assert got == _py_boilerplate(corpus, 3, 2, 20)
