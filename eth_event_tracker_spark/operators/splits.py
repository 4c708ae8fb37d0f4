"""Corpus partitioning for training-data pipelines: per-stratum caps,
leakage-safe train/val/test splits, and deterministic shuffle-sharding.

Like :mod:`.sampling`, every decision here is a pure function of row
identity via the engine-portable ``hash60`` — reproducible across
reruns, engines, repartitioning, and AQE re-plans, and *exactly*
verifiable against the DuckDB oracle.

No counterpart in the reference (it tracks an exhaustive log); this is
the LLM-data surface: cap a crawl's mega-domains, split without
eval-set leakage, and lay the corpus out in reproducible training
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60

_HASH_SPACE = 1 << 60


def per_stratum_cap(
    df: DataFrame,
    cap: int,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
    skew_margin: float | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum (domain, source, language),
    chosen deterministically: the survivors are the ``cap`` smallest
    ``hash60(key)`` values within the stratum — a uniform random-looking
    subset that is stable under reruns and identical in the SQL oracle
    (``ROW_NUMBER() OVER (PARTITION BY stratum ORDER BY h, key) <= cap``).

    100 TB shape: a naive global window shuffles and sorts the whole
    fact table on the stratum key.  Instead the per-stratum counts (a
    tiny map-side-combined aggregate) are broadcast back, and only
    OVER-cap strata enter the window — under-cap strata (the long tail
    of small domains) pass through with zero shuffle.  The fact table is
    scanned twice (counts + branch), which at scale is far cheaper than
    shuffling it once.

    ``skew_margin`` (e.g. 4.0) additionally pre-filters over-cap strata
    to ``hash60(key) < margin * cap / n * 2^60`` before the window, so a
    mega-domain contributes ~``margin * cap`` rows to its window
    partition instead of ``n``.  The cap is then exact unless fewer than
    ``cap`` rows survive the pre-filter — by Chernoff, probability
    ``<= exp(-cap * (margin-1)^2 / (2*margin))`` (~1e-49 for cap=100,
    margin=4), and deterministic for a given dataset (pytest pins
    equality with the exact path on the fixtures).
    """
    h = hash60(F.col(key_col).cast("string"), seed)
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("_n"))
    joined = df.join(F.broadcast(counts), stratum_col)
    small = joined.where(F.col("_n") <= cap).drop("_n")
    big = joined.where(F.col("_n") > cap)
    if skew_margin is not None:
        thr = F.least(
            F.lit(float(_HASH_SPACE)),
            F.lit(float(skew_margin * cap * _HASH_SPACE)) / F.col("_n"),
        ).cast("long")
        big = big.where(h < thr)
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col).asc())
    capped = (
        big.drop("_n")
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= cap)
        .drop("_rk")
    )
    return small.unionByName(capped)


def leakage_safe_split(
    df: DataFrame,
    weights: dict[str, float],
    coherence_col: str | None = None,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Assign a deterministic ``split`` column (train/val/test/...) by
    hashing ``coherence_col`` (default: the row key) into cumulative
    weight bands of the hash space.

    Leakage safety: rows with EQUAL coherence values always land in the
    same split.  Pass the normalized text for exact-duplicate coherence,
    or a near-dup cluster representative (``dup_clusters`` output joined
    on) so an entire near-duplicate cluster stays on one side of the
    train/eval boundary.  Pure projection — zero shuffle, zero join.
    """
    col = F.col(coherence_col if coherence_col is not None else key_col).cast("string")
    h = hash60(col, seed)
    items = list(weights.items())
    total = sum(w for _, w in items)
    case = None
    cum = 0.0
    for name, wgt in items[:-1]:
        cum += wgt / total
        thr = int(cum * _HASH_SPACE)
        case = F.when(h < thr, name) if case is None else case.when(h < thr, name)
    split = F.lit(items[-1][0]) if case is None else case.otherwise(items[-1][0])
    return df.withColumn("split", split)


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic global pseudo-shuffle into ``n_shards`` shards:
    ``shard = hash60(key, seed) % n_shards`` plus a within-shard training
    order ``seq`` (rank of an independent second hash).  Together
    ``(shard, seq)`` is a reproducible random permutation of the corpus
    — the training-order layout step, without ``df.sample``'s
    partition-layout dependence.

    100 TB shape: shards are hash-balanced, and each shard's ``seq``
    window is one task over ~corpus/n_shards rows — pick ``n_shards``
    so a shard fits a task (the same knob as output file size).  Writers
    that only need shard files without an explicit in-file order can
    drop ``seq`` and skip the window entirely.
    """
    h = hash60(F.col(key_col).cast("string"), seed)
    h2 = hash60(F.col(key_col).cast("string"), seed + 1)
    w = Window.partitionBy("shard").orderBy(h2.asc(), F.col(key_col).asc())
    return (
        df.withColumn("shard", h % n_shards)
        .withColumn("seq", F.row_number().over(w).cast("long"))
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    seed: int = 0,
) -> None:
    """Materialize :func:`shuffle_shards` as a dataloader-ready layout:
    ``path/shard=K/`` holds ONE parquet file whose row order IS the
    training order (``seq`` ascending).

    One shuffle total: rows are hash-repartitioned on ``shard`` and
    sorted ``(shard, seq)`` within partitions, so each shard's rows are
    contiguous and ordered when the partitioned writer splits them into
    per-shard directories — no per-shard job, no global sort.  Parquet
    preserves row order, so a reader streaming ``shard=K`` sees exactly
    the reproducible permutation order.

    Sibling: :func:`operators.export.export_shards` is the
    packed-sequence sink with a validated ``_MANIFEST.json`` — use it
    when the consumer needs the corpus-contract audit.
    """
    sharded = shuffle_shards(df, n_shards, key_col=key_col, seed=seed)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "seq")
        .write.mode("error")
        .partitionBy("shard")
        .parquet(path)
    )


def kfold_split(
    df: DataFrame,
    k: int = 5,
    coherence_col: str | None = None,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Assign a deterministic ``fold`` ∈ [0, k) for k-fold
    cross-validation: ``hash60(coherence) % k``.  Same leakage contract
    as :func:`leakage_safe_split` — rows with EQUAL coherence values
    (pass the normalized text, or a near-dup cluster representative)
    always share a fold, so no duplicate can straddle a train/eval
    boundary in ANY of the k rotations.  Unlike the cumulative-band
    split, modulo gives k equal-probability cells directly.  Pure
    projection — zero shuffle, zero join; re-running with the same seed
    on a grown corpus never moves an existing row's fold."""
    if k < 2:
        raise ValueError(f"kfold_split: k must be >= 2, got {k}")
    col = F.col(coherence_col if coherence_col is not None else key_col).cast("string")
    return df.withColumn("fold", F.pmod(hash60(col, seed), F.lit(k)).cast("int"))
