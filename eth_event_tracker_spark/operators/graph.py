"""Iterative graph analytics over edge DataFrames.

Connected components (operators/dedup.dup_clusters) covers the
label-propagation family; this module adds the power-iteration family.
Scale shape shared by both: per round, ONE join of the rank vector
against the edge list + one aggregate — the edge list is the fact table
and partitions on src; lineage is cut per round so round r never
replays rounds 0..r-1; the only driver-side data is the convergence
scalar."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _canon_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected canonical form: (a < b), self-loops dropped, deduped."""
    return (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )


def _degrees(e: DataFrame) -> DataFrame:
    return (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )


def _orient(e: DataFrame, deg: DataFrame) -> DataFrame:
    """Degree orientation (u → w from lower (degree, id) to higher): a
    total order, so the orientation is acyclic, each triangle has
    exactly ONE node with two out-edges, and out-degree is bounded by
    O(√m) regardless of hubs — the skew fix that keeps the wedge
    self-join from exploding on a high-degree node."""
    da = deg.select(F.col("v").alias("_va"), F.col("d").alias("_da"))
    db = deg.select(F.col("v").alias("_vb"), F.col("d").alias("_db"))
    lower_first = F.struct(F.col("_da"), F.col("a")) < F.struct(F.col("_db"), F.col("b"))
    return (
        e.join(da, F.col("a") == F.col("_va"))
        .join(db, F.col("b") == F.col("_vb"))
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("w"),
        )
        .localCheckpoint(eager=False)  # read 3× downstream; cut the join lineage
    )


def _closed_wedges(ori: DataFrame) -> DataFrame:
    """(u, v1, v2) triples where wedge u→v1, u→v2 closes via the
    oriented edge v1→v2 — each triangle appears exactly ONCE (the
    closure edge's own orientation picks one of the wedge's two
    orderings)."""
    o1 = ori.select(F.col("u"), F.col("w").alias("v1"))
    o2 = ori.select(F.col("u"), F.col("w").alias("v2"))
    wedges = o1.join(o2, "u").where(F.col("v1") != F.col("v2"))
    return wedges.join(
        ori.select(F.col("u").alias("v1"), F.col("w").alias("v2")), ["v1", "v2"], "left_semi"
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact triangle count of an undirected graph, one row
    (n_nodes, n_edges, n_triangles).

    The classic distributed algorithm: orient every edge from its
    lower-(degree, id) endpoint to the higher one, then count wedges
    (u→v, u→w) that close via an oriented edge (v→w) — see _orient for
    why degree orientation is the skew fix.  Every pair-forming step is
    an equality join (on u, then on (v, w))."""
    e = _canon_edges(edges, src, dst)
    deg = _degrees(e)
    closed = _closed_wedges(_orient(e, deg))
    n_nodes = deg.agg(F.count("*").alias("n_nodes"))
    n_edges = e.agg(F.count("*").alias("n_edges"))
    return (
        closed.agg(F.count("*").alias("n_triangles"))
        .crossJoin(F.broadcast(n_nodes))
        .crossJoin(F.broadcast(n_edges))
        .select("n_nodes", "n_edges", "n_triangles")
    )


def local_clustering(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle participation + local clustering coefficient:
    (node, degree, n_tri, lcc) with lcc = 2·tri / (d·(d−1)), NULL for
    degree-< 2 nodes (the coefficient is undefined, not zero).

    Same degree-oriented wedge machinery as triangle_count — each
    closed wedge (u, v1, v2) is one distinct triangle, exploded to its
    three member nodes and counted per node (one extra |triangles|-row
    explode + groupBy over triangle_count's plan).  Determinism: tri
    and d·(d−1) are exact integers, lcc one correctly-rounded double
    division — hash-exact vs the SQL twin."""
    e = _canon_edges(edges, src, dst)
    deg = _degrees(e)
    closed = _closed_wedges(_orient(e, deg))
    members = closed.select(
        F.explode(F.array(F.col("u"), F.col("v1"), F.col("v2"))).alias("v")
    )
    tri = members.groupBy("v").agg(F.count("*").alias("n_tri"))
    joined = deg.join(tri, "v", "left").select(
        F.col("v").alias("node"),
        F.col("d").alias("degree"),
        F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
    )
    lcc = F.when(
        F.col("degree") >= 2,
        (F.lit(2) * F.col("n_tri")).cast("double")
        / (F.col("degree") * (F.col("degree") - 1)),
    )
    return joined.withColumn("lcc", lcc)


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iters: int = 20,
    tol: float | None = 1e-6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Standard PageRank by power iteration over (src, dst) edges.

    Per round: distribute each node's rank over its out-edges (join on
    src), sum inbound mass per dst, add the teleport term plus the
    redistributed mass of dangling nodes (nodes with no out-edges —
    dropping it would leak probability and ranks stop summing to 1).
    Stops early when the L1 delta falls under ``tol``.

    ONE driver action per round (round-6 advice #3): the dangling mass
    of the current ranks and the L1 delta vs the previous round come
    out of a single aggregate over one joined frame, so the
    convergence check runs at the top of the NEXT round — identical
    final ranks, half the job launches.  Returns (node, rank); ranks
    sum to 1.

    BIT-PORTABLE power iteration (round 9): ranks are carried as exact
    BIGINT units of 1e-15.  Every cross-row reduction (inbound mass,
    dangling mass, the L1 delta) is an INTEGER sum — order-independent,
    so partitioning/parallelism cannot move a ulp — and each round's
    float work (the unit/out-degree division, the teleport base, the
    final requantization) is a fixed sequence of IEEE double ops on
    exact integers, identical on any engine replaying the same
    expressions.  This is what lets the pagerank registry entry be
    ORACLE-GRADED by an unrolled DuckDB twin.  The quantization
    perturbs each round by ≤ 5e-16 per node — far inside the 1e-9
    tolerance the python-model pins use."""
    UNITS = 10**15
    e = edges.select(F.col(src).alias("node"), F.col(dst).alias("_dst")).localCheckpoint(
        eager=False
    )
    nodes = (
        e.select("node").union(e.select(F.col("_dst").alias("node"))).distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:  # empty edge list → empty ranking, not ZeroDivisionError
        return nodes.withColumn("rank", F.lit(0.0))
    import math

    out_deg = e.groupBy("node").agg(F.count("*").alias("_deg"))
    # half-UP like F.round / DuckDB round (python round() is half-even)
    init_units = int(math.floor(UNITS / n + 0.5))
    # Round-11 join-count fix (guide §2.4): the rank frame CARRIES the
    # static out-degree (joined once here, not once per round) and the
    # previous round's units (so the convergence delta needs no join
    # against a second frame).  The round-10 loop spent 5 joins/round
    # (ranks⋈deg for dangling, ⋈prev for delta, ranks⋈deg⋈e for
    # contribs, nodes⋈inbound for the update); this shape spends 2
    # (⋈e, ⋈inbound) — identical arithmetic, identical ranks, and the
    # ONE-action-per-round discipline is unchanged.
    ranks = (
        nodes.join(out_deg, "node", "left")
        .select(
            "node",
            "_deg",
            F.lit(init_units).cast("long").alias("units"),
            F.lit(None).cast("long").alias("_old"),
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(n_iters):
        aggs = [F.sum(F.when(F.col("_deg").isNull(), F.col("units"))).alias("_dangling")]
        if tol is not None:
            aggs.append(F.sum(F.abs(F.col("units") - F.col("_old"))).alias("_delta"))
        row = ranks.agg(*aggs).first()  # the round's single driver action
        if tol is not None and row["_delta"] is not None and row["_delta"] < tol * UNITS:
            break
        # the exact expression sequence the SQL twin replays:
        dangling_units = row["_dangling"] or 0
        base_units = (
            (1.0 - damping) / n + damping * (dangling_units * 1e-15) / n
        ) * 1e15
        contribs = (
            ranks.where(F.col("_deg").isNotNull())
            .join(e, "node")
            .select(
                F.col("_dst").alias("node"),
                F.round(F.col("units").cast("double") / F.col("_deg"))
                .cast("long")
                .alias("cu"),
            )
        )
        inbound = contribs.groupBy("node").agg(F.sum("cu").alias("in_units"))
        ranks = (
            ranks.join(inbound, "node", "left")
            .select(
                "node",
                "_deg",
                F.round(
                    F.lit(base_units)
                    + F.lit(damping) * F.coalesce(F.col("in_units"), F.lit(0)).cast("double")
                )
                .cast("long")
                .alias("units"),
                F.col("units").alias("_old"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", (F.col("units").cast("double") * F.lit(1e-15)).alias("rank"))


def label_propagation(
    edges: DataFrame,
    n_iters: int = 10,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Community detection by synchronous label propagation over an
    UNDIRECTED view of (src, dst) edges: every node starts as its own
    label; each round a node adopts the most frequent label among its
    neighbors PLUS its own current label (ties → smallest label).  The
    self-vote and the deterministic tie-break are both load-bearing:
    classic async LPA is run-order-dependent (useless for a graded
    engine), and synchronous LPA without the self-vote oscillates on
    symmetric structures — the two ends of a lone edge swap labels
    forever.  Stops early when no label changes.  Returns (node, label).

    Semi-supervised use: pass ``seeds`` via pre-assigned labels by
    unioning a (node, label) frame — not needed for the registry shape.

    100 TB shape (the PageRank discipline): per round, ONE join of the
    label frame onto the symmetrized edge list, one (node, label) count
    aggregate, one per-node argmax window on the node partitioning, and
    ONE driver action (the changed-count) that doubles as the
    convergence check; lineage cut per round so the plan stays flat.
    Skewed hubs cost what any degree join costs — AQE splits them; the
    label-count table is bounded by the edge count, never |V|².
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = und.select(F.col("a").alias("node")).distinct().localCheckpoint(eager=False)
    labels = nodes.select("node", F.col("node").alias("label"))
    lbl_t = und.schema["a"].dataType
    w = Window.partitionBy("node").orderBy(F.desc("_cnt"), F.asc("_lbl"))
    wn = Window.partitionBy("node")
    for _ in range(n_iters):
        # Round-11 join-count fix (guide §2.4): the self-vote row carries
        # the voter's own current label in a side column, and a second
        # window over the SAME node partitioning (no extra exchange)
        # surfaces it next to the argmax winner — so the changed-count
        # needs no join of new labels against old.  2 shuffling joins per
        # round → 1; votes, counts, argmax and the returned labels are
        # byte-identical to the round-10 loop.
        votes = und.join(
            labels.select(F.col("node").alias("b"), F.col("label").alias("_lbl")), "b"
        ).select(F.col("a").alias("node"), "_lbl", F.lit(None).cast(lbl_t).alias("_self"))
        votes = votes.unionByName(
            labels.select(  # the self-vote
                "node", F.col("label").alias("_lbl"), F.col("label").alias("_self")
            )
        )
        neigh = votes.groupBy("node", "_lbl").agg(
            F.count("*").alias("_cnt"), F.max("_self").alias("_was")
        )
        new_labels = (
            neigh.withColumn("_rn", F.row_number().over(w))
            .withColumn("_old", F.max("_was").over(wn))
            .where(F.col("_rn") == 1)
            .select("node", F.col("_lbl").alias("label"), "_old")
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.where(F.col("label") != F.col("_old"))
            .count()  # the round's single driver action
        )
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    return labels


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 100,
) -> DataFrame:
    """The k-core: the maximal subgraph where every node has degree ≥ k,
    by iterative peeling — drop all sub-k nodes, recompute degrees on
    the surviving subgraph, repeat to fixpoint (a chain unravels one
    link per round, which is why the loop, not one filter).  Returns
    (node, degree) with degree measured INSIDE the core.

    The density filter of the graph family: after near-dup edges build
    clusters, the k-core separates genuinely dense duplicate families
    from chains of borderline pairs that LPA would happily glue into
    one community.

    100 TB shape: per round ONE degree aggregate + one two-sided
    semi-join of the edge list against the survivor set (equality
    joins on the endpoint keys), lineage cut per round, and a single
    driver action (the surviving-edge count) — the LPA/PageRank loop
    discipline.  Rounds are bounded by the longest peel chain (a path
    sheds both endpoints per round, so ~diameter/2); if ``max_rounds``
    is exhausted BEFORE the fixpoint the result would be a silently
    too-large core, so the loop raises instead of returning it."""
    e = _canon_edges(edges, src, dst)
    n_edges = e.count()
    converged = n_edges == 0
    for _ in range(max_rounds):
        if converged:
            break
        deg = _degrees(e)
        keep = deg.where(F.col("d") >= k).select("v")
        e2 = (
            e.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
        n2 = e2.count()
        converged = n2 == n_edges or n2 == 0
        e = e2
        n_edges = n2
    if not converged:
        raise RuntimeError(
            f"kcore: no fixpoint within max_rounds={max_rounds} "
            f"({n_edges} edges still peeling) — raise max_rounds; a "
            "partial peel is NOT the k-core"
        )
    out = _degrees(e).select(F.col("v").alias("node"), F.col("d").alias("degree"))
    # isolated survivors cannot exist: degree ≥ k ≥ 1 inside the core
    return out


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 6,
    src: str = "src",
    dst: str = "dst",
    source_col: str = "v",
) -> DataFrame:
    """Unweighted shortest hop distance from a source set by synchronous
    frontier BFS over the undirected graph: (node, hops), hops ≤
    ``max_hops``, sources at 0.  The reachability primitive under
    "within-N-hops-of-a-seed" expansions (contaminated-doc blast radius,
    supplier criticality rings, account-graph risk halos).

    100 TB shape: one equality join (frontier × edges, both directions
    via the canonical edge table's two endpoint columns) + one anti-join
    against the visited set + one distinct per round — ≤ max_hops rounds,
    lineage cut per round, one count action per round.  Frontiers are
    the only iterated state; the visited set grows monotonically and
    would be a checkpointed table at corpus scale.  Deterministic: hop
    numbers are unique per node (first discovery wins, and synchronous
    rounds make discovery order well-defined), so no tie-breaking is
    needed.  DuckDB twin: a bounded recursive CTE taking MIN(d) per node
    (queries/relational.py bfs_hops_cosupply) — the oracle for the loop."""
    e = _canon_edges(edges, src, dst)
    # Round-11 join-count fix (guide §2.4): symmetrize the edge table
    # ONCE so each BFS round probes a single adjacency join instead of
    # joining the frontier against both endpoint columns separately —
    # same neighbor set, half the per-round join stages.
    adj = (
        e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint(eager=False)
    )
    visited = sources.select(F.col(source_col).alias("node")).distinct().select(
        "node", F.lit(0).alias("hops")
    ).localCheckpoint(eager=False)
    frontier = visited.select("node")
    for hop in range(1, max_hops + 1):
        neigh = (
            frontier.join(adj, frontier["node"] == adj["u"])
            .select(F.col("v").alias("node"))
            .distinct()
        )
        new = neigh.join(visited.select("node"), "node", "left_anti").select(
            "node", F.lit(hop).alias("hops")
        ).localCheckpoint(eager=False)
        if new.count() == 0:
            break
        visited = visited.unionAll(new).localCheckpoint(eager=False)
        frontier = new.select("node")
    return visited.select("node", F.col("hops").cast("long").alias("hops"))
