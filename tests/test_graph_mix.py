"""Round-6 operators: triangle_count (degree-oriented wedge join) and
temperature_mix (√n mixture flattening)."""

from __future__ import annotations

import itertools
import pytest
import random

from pyspark.sql import functions as F

from eth_event_tracker_spark.operators.graph import triangle_count
from eth_event_tracker_spark.operators.sampling import temperature_mix


def _brute_triangles(edges: set[tuple[int, int]]) -> int:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = 0
    for u, v, w in itertools.combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            n += 1
    return n


def test_triangle_count_matches_brute_force(spark):
    rng = random.Random(11)
    nodes = list(range(30))
    edges = {(a, b) for a in nodes for b in nodes if a < b and rng.random() < 0.2}
    # feed duplicates, reversals, and self-loops: the operator must
    # canonicalize (dedup + undirect + drop loops) before counting
    rows = [(a, b) for a, b in edges] + [(b, a) for a, b in list(edges)[:20]] + [(5, 5)]
    df = spark.createDataFrame(rows, "src long, dst long")
    got = triangle_count(df).first()
    assert got.n_triangles == _brute_triangles(edges)
    assert got.n_edges == len(edges)


def test_triangle_count_hub_graph(spark):
    """A star hub (worst case for naive src-keyed wedge joins) plus a
    ring: degree orientation points every spoke INTO the hub, so the
    hub contributes zero wedges — count stays exact and the wedge set
    stays linear, not O(hub_degree²)."""
    hub_edges = [(0, i) for i in range(1, 41)]
    ring = [(i, i + 1) for i in range(1, 40)] + [(40, 1)]
    df = spark.createDataFrame(hub_edges + ring, "src long, dst long")
    got = triangle_count(df).first()
    # each ring edge forms exactly one triangle with the hub
    assert got.n_triangles == _brute_triangles(set(hub_edges + ring)) == 40


def test_triangle_count_empty_and_triangle_free(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    r = triangle_count(empty).first()
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (0, 0, 0)
    # bipartite graph: never a triangle
    bip = spark.createDataFrame(
        [(a, 100 + b) for a in range(5) for b in range(5)], "src long, dst long"
    )
    assert triangle_count(bip).first().n_triangles == 0


def test_temperature_mix_flattens_to_sqrt_proportions(spark):
    import math

    rows = []
    sizes = {"en": 3200, "fr": 800, "de": 200}
    i = 0
    for lang, n in sizes.items():
        for _ in range(n):
            rows.append((i, lang))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_mix(df, stratum_col="lang")
    counts = {r.lang: r.c for r in kept.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    # smallest stratum survives whole (k = 1.0)
    assert counts["de"] == 200
    # others land near sqrt(n_min * n_s) within binomial noise (4σ)
    for lang in ("en", "fr"):
        expect = math.sqrt(200 * sizes[lang])
        sd = math.sqrt(sizes[lang] * 0.25)  # p(1-p) ≤ 1/4
        assert abs(counts[lang] - expect) < 4 * sd, (lang, counts[lang], expect)
    # deterministic: a rerun (and a repartition) keeps the identical set
    ids1 = {r.doc_id for r in kept.collect()}
    ids2 = {r.doc_id for r in temperature_mix(df.repartition(13), stratum_col="lang").collect()}
    assert ids1 == ids2


def _write_events(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([base + dt.timedelta(minutes=r[2]) for r in rows],
                           pa.timestamp("us")),
        }
    )
    pq.write_table(table, str(path))


def test_stream_stream_join_matches_batch_twin(spark, tmp_path):
    """Watermarked stream-stream join == the batch join over the same
    data (inner), and the left-outer arm emits unmatched views with null
    purchase once the watermark passes their join window."""
    from eth_event_tracker_spark.streaming.analytics import stream_stream_attribution

    views = [  # (event_id, user_id, minute)
        (1, 1, 0), (2, 2, 0), (3, 3, 5), (4, 4, 10), (5, 1, 200),
    ]
    purchases = [  # user 1 buys 30min after view; user 3 at 50min; user 2 too late (90min)
        (101, 1, 30), (102, 3, 55), (103, 2, 95), (104, 9, 40),
    ]
    vdir, pdir = tmp_path / "v", tmp_path / "p"
    vdir.mkdir(); pdir.mkdir()
    _write_events(vdir / "a.parquet", views)
    _write_events(pdir / "a.parquet", purchases)

    schema = "event_id long, user_id long, ts timestamp"

    def run(join_type, out_name):
        vs = spark.readStream.schema(schema).parquet(str(vdir))
        ps = spark.readStream.schema(schema).parquet(str(pdir))
        q = (
            stream_stream_attribution(vs, ps, join_type=join_type)
            .writeStream.format("memory")
            .queryName(out_name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ck_{out_name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.exception() is None, q.exception()
        return spark.table(out_name)

    # batch twin: identical expressions over static frames
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    bv = spark.createDataFrame(
        [(e, u, base + dt.timedelta(minutes=m)) for e, u, m in views], schema
    )
    bp = spark.createDataFrame(
        [(e, u, base + dt.timedelta(minutes=m)) for e, u, m in purchases], schema
    )
    want = {
        (r.user_id, r.view_id, r.purchase_id)
        for r in stream_stream_attribution(bv, bp, join_type="inner").collect()
    }
    got = {(r.user_id, r.view_id, r.purchase_id) for r in run("inner", "ss_inner").collect()}
    assert got == want and (1, 1, 101) in got and (3, 3, 102) in got
    assert (2, 2, 103) not in got, "95min > 1h horizon must not match"

    # left outer: after a watermark-advancing flush file, the unmatched
    # old views emit with null purchase
    run("left_outer", "ss_outer")
    _write_events(vdir / "flush_v.parquet", [(900, 99, 600)])
    _write_events(pdir / "flush_p.parquet", [(901, 99, 600)])
    outer = run("left_outer", "ss_outer2")
    rows = {(r.user_id, r.view_id, r.purchase_id) for r in spark.table("ss_outer").unionByName(outer).collect()}
    matched = {(u, v) for (u, v, p) in rows if p is not None}
    assert {(1, 1), (3, 3)} <= matched
    unmatched = {(u, v) for (u, v, p) in rows if p is None}
    assert {(2, 2), (4, 4)} <= unmatched, f"unmatched views must emit nulls, got {rows}"


def test_stream_static_enrichment_matches_batch(spark, tmp_path):
    """Stream-STATIC join (dimension enrichment of a live stream): the
    static side rides a broadcast into every micro-batch — no state
    store, no watermark needed (completes the streaming join matrix
    alongside the stream-stream test above)."""
    from pyspark.sql import functions as F

    events = [(1, 1, 0), (2, 2, 1), (3, 1, 2), (4, 9, 3)]  # user 9 has no dim row
    edir = tmp_path / "ev"
    edir.mkdir()
    _write_events(edir / "a.parquet", events)
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver"), (3, "bronze")], "user_id long, tier string"
    )

    schema = "event_id long, user_id long, ts timestamp"
    stream = spark.readStream.schema(schema).parquet(str(edir))
    enriched = stream.join(F.broadcast(dim), "user_id", "left")
    q = (
        enriched.writeStream.format("memory")
        .queryName("ss_static")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None, q.exception()

    got = {(r.event_id, r.tier) for r in spark.table("ss_static").collect()}
    assert got == {(1, "gold"), (3, "gold"), (2, "silver"), (4, None)}


def test_temperature_upsample_repeats_toward_sqrt(spark):
    import math

    from eth_event_tracker_spark.operators.sampling import temperature_upsample

    sizes = {"en": 3200, "fr": 800, "de": 200}
    rows, i = [], 0
    for lang, n in sizes.items():
        for _ in range(n):
            rows.append((i, lang))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    up = temperature_upsample(df, stratum_col="lang")
    counts = {r.lang: r.c for r in up.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    # the LARGEST stratum emits exactly one copy per row (k = 1.0)
    assert counts["en"] == 3200
    # tail strata land near sqrt(n_max * n_s) within binomial noise on
    # the fractional copy (4 sigma)
    for lang in ("fr", "de"):
        expect = math.sqrt(3200 * sizes[lang])
        sd = math.sqrt(sizes[lang] * 0.25)
        assert abs(counts[lang] - expect) < 4 * sd, (lang, counts[lang], expect)
    # every row keeps >= 1 copy with contiguous repeat_idx from 0
    per = up.groupBy("doc_id").agg(
        F.count("*").alias("c"), F.min("repeat_idx").alias("lo"), F.max("repeat_idx").alias("hi")
    )
    bad = per.where((F.col("lo") != 0) | (F.col("hi") != F.col("c") - 1)).count()
    assert bad == 0 and per.count() == len(rows)
    # deterministic under repartition
    a = sorted((r.doc_id, r.repeat_idx) for r in up.collect())
    b = sorted(
        (r.doc_id, r.repeat_idx)
        for r in temperature_upsample(df.repartition(7), stratum_col="lang").collect()
    )
    assert a == b


def test_temperature_samplers_keep_null_stratum_rows(spark):
    """Round-7 review: a NULL stratum is a stratum — the equality join
    used to silently drop every NULL-lang row from mix AND upsample; an
    optional mixing stage must never lose rows."""
    from eth_event_tracker_spark.operators.sampling import (
        temperature_mix,
        temperature_upsample,
    )

    rows = (
        [(i, "en") for i in range(400)]
        + [(1000 + i, None) for i in range(4)]  # tiny NULL stratum
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    # mix: NULL is the smallest stratum → keep-rate 1.0, all 4 survive
    kept = temperature_mix(df, stratum_col="lang")
    null_kept = kept.where(F.col("lang").isNull()).count()
    assert null_kept == 4, f"NULL-stratum rows must survive mixing, kept {null_kept}"

    # upsample: √(400/4) = 10 exactly → each NULL-lang doc emits 10 copies
    up = temperature_upsample(df, stratum_col="lang")
    null_up = up.where(F.col("lang").isNull()).count()
    assert null_up == 40, f"NULL stratum must upsample like any other, got {null_up}"
    assert up.where(F.col("lang") == "en").count() == 400  # head stays 1x


class TestLocalClustering:
    def _lcc(self, spark, edges):
        from eth_event_tracker_spark.operators.graph import local_clustering

        df = spark.createDataFrame(edges, "src long, dst long")
        return {
            r["node"]: (r["degree"], r["n_tri"], r["lcc"])
            for r in local_clustering(df).collect()
        }

    def test_complete_k4_is_all_ones(self, spark):
        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        got = self._lcc(spark, k4)
        # every node: degree 3, in 3 triangles, lcc = 2*3/(3*2) = 1.0
        assert got == {v: (3, 3, 1.0) for v in range(4)}

    def test_star_hub_is_zero_leaves_null(self, spark):
        star = [(0, i) for i in range(1, 6)]
        got = self._lcc(spark, star)
        assert got[0] == (5, 0, 0.0), "hub has wedges but no closures"
        for leaf in range(1, 6):
            assert got[leaf] == (1, 0, None), "degree-1 lcc is undefined"

    def test_triangle_with_tail(self, spark):
        # triangle 0-1-2 plus tail 2-3: node 2 has degree 3, 1 triangle
        # -> lcc = 2/(3*2) = 1/3 exactly
        got = self._lcc(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
        assert got[0] == (2, 1, 1.0)
        assert got[1] == (2, 1, 1.0)
        assert got[2] == (3, 1, pytest.approx(1 / 3, abs=0))
        assert got[3] == (1, 0, None)

    def test_coheres_with_triangle_count(self, spark):
        from eth_event_tracker_spark.operators.graph import (
            local_clustering,
            triangle_count,
        )

        rng = [(i, (i * 7 + 3) % 40) for i in range(120)] + [
            (i % 23, (i * 5 + 1) % 23) for i in range(80)
        ]
        edges = [(a, b) for a, b in rng if a != b]
        df = spark.createDataFrame(edges, "src long, dst long")
        total = triangle_count(df).first()["n_triangles"]
        per_node = local_clustering(df).agg(F.sum("n_tri")).first()[0]
        # each triangle contributes to exactly 3 nodes
        assert per_node == 3 * total


def _py_kcore(edges, k):
    """Reference peel in pure python."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj[v]:
                    adj[u].discard(v)
                del adj[v]
                changed = True
    return {v: len(ns) for v, ns in adj.items() if ns}


class TestKCore:
    def _run(self, spark, edges, k):
        from eth_event_tracker_spark.operators.graph import kcore

        df = spark.createDataFrame(edges, "src long, dst long")
        return {r["node"]: r["degree"] for r in kcore(df, k=k).collect()}

    def test_clique_survives_tails_peel(self, spark):
        k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
        tails = [(0, 10), (10, 11), (11, 12)]  # chain hanging off the clique
        got = self._run(spark, k5 + tails, k=4)
        assert got == {v: 4 for v in range(5)}, (
            "the 5-clique is the 4-core; the chain must fully unravel"
        )

    def test_chain_unravels_iteratively(self, spark):
        # a pure path: every node has degree <= 2 but the 2-core of a
        # path is EMPTY — each round only exposes the next endpoint, so
        # this pins the fixpoint loop (one filter pass would stop early)
        path = [(i, i + 1) for i in range(10)]
        assert self._run(spark, path, k=2) == {}
        # ...while a cycle IS its own 2-core
        cycle = path + [(10, 0)]
        assert self._run(spark, cycle, k=2) == {v: 2 for v in range(11)}

    def test_matches_python_model(self, spark):
        edges = [(i % 17, (i * 3 + 1) % 17) for i in range(60)] + [
            (i % 29, (i * 7 + 2) % 29) for i in range(50)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        for k in (1, 2, 3, 4):
            assert self._run(spark, edges, k=k) == _py_kcore(edges, k), k

    def test_k1_drops_nothing_but_isolates(self, spark):
        got = self._run(spark, [(1, 2), (3, 4), (5, 5)], k=1)
        assert got == {1: 1, 2: 1, 3: 1, 4: 1}, "self-loop 5 is no edge"


def test_kcore_raises_on_exhausted_rounds(spark):
    """A partial peel is NOT the k-core: exhausting max_rounds before
    the fixpoint must raise, never return the too-large intermediate."""
    from eth_event_tracker_spark.operators.graph import kcore

    path = [(i, i + 1) for i in range(12)]  # needs ~6 rounds at k=2
    df = spark.createDataFrame(path, "src long, dst long")
    with pytest.raises(RuntimeError, match="max_rounds"):
        kcore(df, k=2, max_rounds=2)
    # and with enough rounds the same input converges to empty
    assert kcore(df, k=2, max_rounds=50).count() == 0
