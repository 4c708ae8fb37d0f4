"""Iterative graph analytics over edge DataFrames.

Connected components (operators/dedup.dup_clusters) covers the
label-propagation family; this module adds the power-iteration family.
Scale shape shared by both: per round, ONE join of the rank vector
against the edge list + one aggregate — the edge list is the fact table
and partitions on src; lineage is cut per round so round r never
replays rounds 0..r-1; the only driver-side data is the convergence
scalar."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    Stops early when the L1 delta falls under ``tol`` (one scalar
    ``first()`` per round — bounded driver data).  Returns
    (node, rank); ranks sum to 1."""
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
    out_deg = e.groupBy("node").agg(F.count("*").alias("_deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iters):
        contribs = (
            ranks.join(out_deg, "node")
            .join(e, "node")
            .select(F.col("_dst").alias("node"), (F.col("rank") / F.col("_deg")).alias("mass"))
        )
        inbound = contribs.groupBy("node").agg(F.sum("mass").alias("in_mass"))
        dangling = (
            ranks.join(out_deg, "node", "left_anti").agg(F.sum("rank").alias("d")).first()[0]
            or 0.0
        )
        base = (1.0 - damping) / n + damping * dangling / n
        new_ranks = (
            nodes.join(inbound, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=False)
        )
        if tol is not None:
            delta = (
                new_ranks.join(ranks.withColumnRenamed("rank", "_old"), "node")
                .agg(F.sum(F.abs(F.col("rank") - F.col("_old"))).alias("d"))
                .first()[0]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks
