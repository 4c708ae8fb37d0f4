"""PageRank vs a pure-python power-iteration model."""

from __future__ import annotations

from eth_event_tracker_spark.operators.graph import pagerank


def _model(edges, damping=0.85, n_iters=20, tol=1e-6):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(n_iters):
        dangling = sum(r for v, r in rank.items() if v not in out)
        base = (1 - damping) / n + damping * dangling / n
        new = {v: base for v in nodes}
        for s, dsts in out.items():
            share = rank[s] / len(dsts)
            for d in dsts:
                new[d] += damping * share
        delta = sum(abs(new[v] - rank[v]) for v in nodes)
        rank = new
        if delta < tol:
            break
    return rank


def test_pagerank_matches_model_with_dangling(spark):
    # 1→2, 1→3, 2→3, 4→1; node 3 dangles (no out-edges)
    edges = [(1, 2), (1, 3), (2, 3), (4, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, n_iters=30).collect()}
    want = _model(edges, n_iters=30)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, f"node {v}: {got[v]} vs {want[v]}"
    assert abs(sum(got.values()) - 1.0) < 1e-9, "ranks must sum to 1 (dangling mass kept)"


def test_pagerank_ring_is_uniform(spark):
    ring = [(i, (i + 1) % 6) for i in range(6)]
    df = spark.createDataFrame(ring, "src long, dst long")
    got = [r.rank for r in pagerank(df, n_iters=40).collect()]
    assert all(abs(r - 1 / 6) < 1e-9 for r in got)


def test_pagerank_one_driver_action_per_round(spark, monkeypatch):
    """Round-6 advice #3: dangling mass + convergence delta come out of
    ONE aggregate — exactly one .first() per iteration, not two."""
    # patch the concrete class (pyspark.sql.DataFrame is abstract in 4.x)
    from pyspark.sql.classic.dataframe import DataFrame

    calls = {"first": 0}
    orig = DataFrame.first

    def counting_first(self):
        calls["first"] += 1
        return orig(self)

    monkeypatch.setattr(DataFrame, "first", counting_first)
    edges = [(1, 2), (1, 3), (2, 3), (4, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")

    # far-from-converged budget: every round runs → n_iters actions
    pagerank(df, n_iters=5, tol=1e-300).collect()
    assert calls["first"] == 5, f"expected 1 action/round, saw {calls['first']}/5 rounds"

    # tol=None: still one action per round (the dangling mass)
    calls["first"] = 0
    pagerank(df, n_iters=3, tol=None).collect()
    assert calls["first"] == 3


# ---------------------------------------------------------------------------
# label propagation communities
# ---------------------------------------------------------------------------
def test_lpa_recovers_planted_communities(spark):
    """Two 5-cliques joined by ONE bridge edge: LPA assigns each clique
    one label and the two labels differ; the bridge does not merge them."""
    from eth_event_tracker_spark.operators.graph import label_propagation

    c1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    c2 = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    edges = spark.createDataFrame(c1 + c2 + [(4, 10)], "src long, dst long")
    lab = {r.node: r.label for r in label_propagation(edges).collect()}
    assert len({lab[n] for n in range(5)}) == 1
    assert len({lab[n] for n in range(10, 15)}) == 1
    assert lab[0] != lab[10]


def test_lpa_deterministic_and_converges(spark):
    from eth_event_tracker_spark.operators.graph import label_propagation

    import random

    rng = random.Random(7)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(120)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted((r.node, r.label) for r in label_propagation(df).collect())
    b = sorted((r.node, r.label) for r in label_propagation(df.repartition(32)).collect())
    assert a == b  # synchronous + deterministic tie-break → run-stable


def test_lpa_isolated_pair_and_empty(spark):
    from eth_event_tracker_spark.operators.graph import label_propagation

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    lab = {r.node: r.label for r in label_propagation(df).collect()}
    assert lab[1] == lab[2]
    empty = spark.createDataFrame([], "src long, dst long")
    assert label_propagation(empty).count() == 0


def test_bfs_hops_path_graph(spark):
    """A path 0-1-2-3-4: hops from node 0 are the positions; a
    disconnected island never appears; max_hops truncates."""
    from eth_event_tracker_spark.operators.graph import bfs_hops

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    seed = spark.createDataFrame([(0,)], "v long")
    got = {r.node: r.hops for r in bfs_hops(df, seed).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}
    capped = {r.node: r.hops for r in bfs_hops(df, seed, max_hops=2).collect()}
    assert capped == {0: 0, 1: 1, 2: 2}


def test_bfs_hops_shortest_wins_and_multi_source(spark):
    """A cycle gives two routes — the shorter one wins; multiple seeds
    all start at 0 and the min over seeds is reported."""
    from eth_event_tracker_spark.operators.graph import bfs_hops

    # 6-cycle: from 0, node 3 is 3 hops either way; node 5 is 1 hop back
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    df = spark.createDataFrame(cyc, "src long, dst long")
    got = {r.node: r.hops for r in bfs_hops(df, spark.createDataFrame([(0,)], "v long")).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 2, 5: 1}
    two = {
        r.node: r.hops
        for r in bfs_hops(df, spark.createDataFrame([(0,), (3,)], "v long")).collect()
    }
    assert two == {0: 0, 3: 0, 1: 1, 2: 1, 4: 1, 5: 1}
