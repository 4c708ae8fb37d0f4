"""Engine-portable SemDeDup: k-means whose every float decision is
bit-replayable by a DuckDB twin (round-9 verdict item 1).

The rows-only blocker on ``semantic_dedup_emb`` was k-means float order:
seeding used normalize-then-BLAS-matmul similarities and the Lloyd update
was a float mean — both orders an oracle cannot replay.  This module
re-expresses the SAME algorithm (hash-ordered sample → greedy
farthest-point seeding → Lloyd rounds → within-cluster exact-cosine
pairs → min-id components) with the round-9 integer-unit recipe that
promoted pagerank (queries/relational.py pagerank_cosupply docstring):

* vectors quantize ONCE to BIGINT 1e-6 units (``F.round(x*1e6)``) — the
  only lossy step, applied identically by both engines;
* every cross-row aggregate is an exact INTEGER sum (sample dot
  products, Lloyd centroid updates), order-independent by construction —
  centroids are carried as raw integer component SUMS, never divided:
  cosine is scale-invariant so the mean's 1/n cancels;
* every remaining float expression is a fixed-length sequence of
  correctly-rounded IEEE ops on exactly-representable integer inputs
  (int→double casts of values < 2^53, one multiply per element folded
  LEFT-TO-RIGHT from a 0.0 accumulator, one sqrt, one divide) — the
  lsh_bucket/MMR fold discipline, so Spark, numpy, pure python and
  DuckDB all produce bit-identical scores;
* argmax tie-breaks on lowest centroid id (numpy first-max ==
  ``row_number() OVER (ORDER BY score DESC, cid)``).

Reference semantics: SemDeDup (Abbas et al. 2023) as in
``similarity.semantic_dedup``; reference repo analogue: none (the Go
tracker has no embedding ops) — this extends the LLM-data surface.

100 TB shape: the driver holds only the k×d integer centroid matrix and
the ≤max(k, 256)-row sample; assignment is an Arrow-batched pandas UDF
(one pass per Lloyd round); updates are map-side-combined integer sums;
the pair join is an equality join on centroid_id; components run on
pairs only.  ``collapse_exact`` pre-groups bit-identical vectors before
the pair join exactly like the LSH/SemDeDup tiers (identical raw vectors
quantize identically, hence share a cluster)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import hash60

_UNIT = 1_000_000.0  # quantization: BIGINT units of 1e-6


def _fold64(a, b) -> float:
    """Strict left-to-right double fold of element products from a 0.0
    accumulator — the exact sequence of `_duck_fold_dot` and the pandas
    UDF's per-dimension loop."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def quantized(vec_col) -> F.Column:
    """The vector in integer units: round(x * 1e6) per component —
    F.round is the same round-half-away-from-zero both engines apply."""
    return F.transform(
        vec_col, lambda x: F.round(x.cast("double") * F.lit(_UNIT)).cast("long")
    )


def build_portable_centroids(
    qdf: DataFrame,
    n_clusters: int,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vq_col: str = "vq",
) -> list[list[int]]:
    """Greedy farthest-point seeding + ``n_iters`` Lloyd rounds, every
    step integer-exact or fixed-order IEEE:

    * sample = first ``max(k, min(256, 32k))`` rows by
      (hash60(id, "ivf"), id) — the engine-portable analogue of
      ivf_build_centroids' xxhash64 order;
    * seed sims: exact integer dots, one cast, one divide by the two
      sqrt'd self-dot casts; argmin ties -> lowest sample index
      (list.index / DuckDB list_position semantics);
    * Lloyd update: centroid := exact integer component SUM of its
      members (no division — cosine ignores scale); empty clusters keep
      their previous coordinates.

    Returns centroids as python-int lists (exact, overflow-free)."""
    n_sample = max(n_clusters, min(256, 32 * n_clusters))
    sample = (
        qdf.select(id_col, vq_col)
        .orderBy(hash60(F.col(id_col).cast("string"), F.lit("ivf")), id_col)
        .limit(n_sample)
        .collect()
    )
    if not sample:
        raise ValueError("build_portable_centroids: empty corpus")
    s = [[int(x) for x in r[1]] for r in sample]
    ns = len(s)
    # pairwise sims in one exact int64 matmul: INTEGER dot products are
    # order-independent (unlike float folds), so any summation order
    # matches the twin's list_reduce bit-for-bit; the float expression
    # that follows — cast / (sqrt(cast) * sqrt(cast)) — is the pinned
    # elementwise IEEE sequence both engines replay.  Magnitude bound:
    # |vq| ≤ ~1e8 ⇒ per-pair dot ≤ 64·1e16 < 2^63.
    s_np = np.array(s, dtype=np.int64)
    gram = s_np @ s_np.T
    rt = np.sqrt(np.diag(gram).astype(np.float64))
    sims = gram.astype(np.float64) / (rt[:, None] * rt[None, :])

    chosen = [0]
    minsim = sims[0].copy()
    while len(chosen) < min(n_clusters, ns):
        nxt = int(np.argmin(minsim))  # leftmost min — both engines
        chosen.append(nxt)
        minsim = np.maximum(minsim, sims[nxt])
    while len(chosen) < n_clusters:  # degenerate: fewer rows than k
        chosen.append(chosen[len(chosen) % ns])
    cents = [list(s[i]) for i in chosen]

    for _ in range(n_iters):
        assigned = assign_portable(qdf, cents, id_col, vq_col)
        sums = (
            assigned.select("centroid_id", F.posexplode(vq_col).alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(F.sum("x").alias("s"))  # exact BIGINT — order-independent
            .collect()
        )
        by_c: dict[int, dict[int, int]] = {}
        for r in sums:
            by_c.setdefault(r.centroid_id, {})[r.pos] = int(r.s)
        cents = [
            [by_c[ci][p] for p in sorted(by_c[ci])] if ci in by_c else cents[ci]
            for ci in range(n_clusters)
        ]
    return cents


def assign_portable(
    df: DataFrame, cents: list[list[int]], id_col: str = "vec_id", vq_col: str = "vq"
) -> DataFrame:
    """Tag each quantized vector with its portable nearest centroid:
    score = fold64(vq, c) / sqrt(fold64(c, c)) (the row's own norm is
    constant across centroids, so it cancels out of the argmax), ties ->
    lowest centroid id.  Arrow-batched; the per-dimension accumulator
    loop IS the left-to-right fold the DuckDB twin replays."""
    from pyspark.sql.functions import pandas_udf

    k = len(cents)
    cents_np = np.array(cents, dtype=np.float64)  # exact: |sums| < 2^53
    cnorm = [math.sqrt(_fold64(c, c)) for c in cents]
    dim = len(cents[0])

    @pandas_udf("int")
    def nearest(vqs: pd.Series) -> pd.Series:
        m = np.stack(vqs.to_numpy()).astype(np.float64)
        scores = np.empty((len(m), k))
        for c in range(k):
            acc = np.zeros(len(m))
            row = cents_np[c]
            for d in range(dim):
                acc += m[:, d] * row[d]
            scores[:, c] = acc / cnorm[c]
        # first-max == ORDER BY score DESC, cid ASC
        return pd.Series(np.argmax(scores, axis=1).astype(np.int32))

    return df.withColumn("centroid_id", nearest(F.col(vq_col)))


def semantic_dup_pairs_portable(
    df: DataFrame,
    threshold: float = 0.9,
    n_clusters: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[int]] | None = None,
    collapse_exact: bool = True,
    n_rows: int | None = None,
) -> DataFrame:
    """Within-cluster pairs (id_a, id_b, cosine), id_a < id_b, cosine =
    round(ordered-fold dot / (norm_a * norm_b), 9) on the RAW doubles —
    identical arithmetic to similarity.semantic_dup_pairs; only the
    cluster ASSIGNMENT differs (portable k-means above).  auto-k =
    max(16, min(4096, N // 256)) — the linear-total-work contract."""
    from .similarity import _dbl_dot, _expand_exact_groups

    if n_clusters is None:
        if n_rows is None:
            n_rows = df.count()
        n_clusters = max(16, min(4096, n_rows // 256))
    if centroids is None:
        qdf = df.select(id_col, quantized(F.col(vec_col)).alias("vq")).localCheckpoint(
            eager=False
        )
        centroids = build_portable_centroids(qdf, n_clusters, 2, id_col, "vq")
    if collapse_exact:
        return _expand_exact_groups(
            df,
            lambda reps: semantic_dup_pairs_portable(
                reps, threshold, n_clusters, id_col, vec_col,
                centroids=centroids, collapse_exact=False,
            ),
            threshold,
            id_col,
            vec_col,
            round_digits=9,
        )
    v = F.col(vec_col)
    tagged = (
        assign_portable(
            df.select(id_col, vec_col, quantized(v).alias("vq")), centroids, id_col, "vq"
        )
        .withColumn("nrm", F.sqrt(_dbl_dot(v, v)))
        .select(id_col, vec_col, "centroid_id", "nrm")
        .localCheckpoint(eager=False)
    )
    a = tagged.select(
        "centroid_id", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("nrm").alias("na")
    )
    b = tagged.select(
        "centroid_id", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("nrm").alias("nb")
    )
    return (
        a.join(b, "centroid_id")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(_dbl_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 9),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semantic_dedup_portable(
    df: DataFrame,
    threshold: float = 0.9,
    n_clusters: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    collapse_exact: bool = True,
) -> DataFrame:
    """Portable SemDeDup end-to-end: portable within-cluster pairs →
    min-id connected components → drop non-minimum members; returns the
    surviving rows of ``df`` unchanged (same contract as
    similarity.semantic_dedup)."""
    from .dedup import dup_clusters

    pairs = semantic_dup_pairs_portable(
        df, threshold, n_clusters, id_col, vec_col, collapse_exact=collapse_exact
    )
    comps = dup_clusters(pairs, "id_a", "id_b")
    drops = comps.where(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(drops, id_col, "left_anti")
