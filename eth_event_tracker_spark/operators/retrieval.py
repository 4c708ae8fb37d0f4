"""Persisted inverted index + index-backed BM25 — retrieval as a TABLE,
not a per-query corpus scan.

``bm25_topk`` (operators/text.py) tokenizes the whole corpus per query;
right for ad-hoc use, wrong for a query WORKLOAD.  The index flips the
cost: one corpus pass at build time materializes

  ``<path>/postings``   (term, doc_id, tf), hive-partitioned by
                        ``pbucket = hash60(term) % n_buckets`` — a query
                        reads ONLY its terms' buckets (partition pruning,
                        plan-asserted in tests) and filters to its terms
                        inside them (parquet predicate pushdown);
  ``<path>/docstats``   (doc_id, dl) for EVERY doc — token-less docs get
                        dl = 0, so corpus-level stats (N, total length)
                        derived from this table equal the scan path's.

Global BM25 stats (N, avgdl, per-term df) are computed at query time —
docstats is one tiny aggregate and df comes from the already-pruned
postings — so INCREMENTAL index maintenance is plain appends
(``append_text_index``): no stored statistic goes stale.

The scoring tail is text.bm25_rank — the SAME code object the scan path
uses — so ``bm25_query(index) == bm25_topk(corpus)`` bit-for-bit (pinned
in tests, including after an incremental append).

The term→bucket map must be computable on the DRIVER (to prune before
any job runs): ``hash60_py`` is the pinned Python twin of the hash60
SQL/Spark expression.

100 TB shape: build is the one token shuffle every BM25 needs anyway;
a query touches |query| buckets ≈ corpus/n_buckets bytes each, joins
docstats on the doc key, and TakeOrders the top-n.  At real scale
n_buckets grows with the corpus (buckets ≈ a few GB each) and postings
within a bucket are additionally sorted by term at write
(``sortWithinPartitions``) so parquet row-group min/max statistics prune
inside the bucket too.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60, hash60_py
from ..store.filecompact import compact_dirs, compact_recover, dir_lock
from .text import bm25_rank, words

_TERM_SEED = 7  # index bucket seed — any fixed value, shared by build + query


def _tf_table(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    par = df.sparkSession.sparkContext.defaultParallelism
    toks = (
        df.repartition(par, F.col(id_col))
        .select(F.col(id_col), F.explode(words(F.col(text_col))).alias("term"))
        .where(F.col("term") != "")
    )
    return toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))


def _write(df: DataFrame, tf_all: DataFrame, path: str, id_col: str, n_buckets: int, mode: str) -> None:
    # the index lock serializes build/append against compact_text_index
    # (same driver-side flock discipline as the corpus sink), and the
    # recovery pass means an append can never land files into a
    # partition whose pre-compaction rows are still staged
    root = path.rstrip("/")
    with dir_lock(root):
        compact_recover(root)
        if os.path.isdir(root + "/postings"):
            compact_recover(root + "/postings")
        postings = tf_all.withColumn(
            "pbucket", (hash60(F.col("term"), _TERM_SEED) % n_buckets).cast("int")
        )
        (
            postings.repartition("pbucket")
            .sortWithinPartitions("term")
            .write.mode(mode)
            .partitionBy("pbucket")
            .parquet(root + "/postings")
        )
        dlen = tf_all.groupBy(id_col).agg(F.sum("tf").alias("dl"))
        docstats = (
            df.select(id_col)
            .join(dlen, id_col, "left")
            .select(id_col, F.coalesce("dl", F.lit(0)).alias("dl"))
        )
        docstats.write.mode(mode).parquet(root + "/docstats")


def compact_text_index(
    spark: SparkSession, path: str, max_files: int = 4, files_after: int = 1
) -> int:
    """Small-file compaction for the incrementally-maintained index:
    every ``append_text_index`` lands one file set per touched
    ``pbucket`` partition and one more in ``docstats`` — the same
    streaming-sink small-files problem the curation corpus has, solved
    through the SAME shared staged-swap protocol
    (store/filecompact.py): per-partition commit-marked swap, flock
    against the build/append path, crash recovery on every locked
    entry.  Postings rewrites re-sort by ``term`` so parquet row-group
    min/max pruning inside a bucket keeps working after compaction.
    Query results are pinned bit-identical before/after (tests).
    Returns the number of partitions compacted."""
    root = path.rstrip("/")
    if not os.path.isdir(root):
        return 0
    done = 0
    with dir_lock(root):
        post_root = root + "/postings"
        if os.path.isdir(post_root):
            compact_recover(post_root)
            names = [
                n for n in sorted(os.listdir(post_root)) if n.startswith("pbucket=")
            ]
            done += compact_dirs(
                spark, post_root, names, max_files=max_files,
                files_after=files_after, sort_col="term",
            )
        compact_recover(root)
        if os.path.isdir(root + "/docstats"):
            done += compact_dirs(
                spark, root, ["docstats"], max_files=max_files,
                files_after=files_after,
            )
    return done


def build_text_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> None:
    """One corpus pass → the postings + docstats tables (overwrite)."""
    tf_all = _tf_table(df, text_col, id_col).localCheckpoint(eager=False)
    _write(df, tf_all, path, id_col, n_buckets, "overwrite")


def append_text_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> None:
    """Incremental maintenance: index NEW docs (ids must be previously
    unseen — the caller's admission pipeline guarantees that; a re-added
    id would double count its postings).  ``n_buckets`` must match the
    build.  Postings/docstats appends land as new files in the same
    bucket directories; no existing file is touched and no stored
    statistic exists to go stale (module docstring)."""
    tf_all = _tf_table(df, text_col, id_col).localCheckpoint(eager=False)
    _write(df, tf_all, path, id_col, n_buckets, "append")


def bm25_query(
    spark: SparkSession,
    path: str,
    query_terms: list[str],
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
    n_buckets: int = 64,
) -> DataFrame:
    """Index-backed BM25: reads only the query terms' partition buckets,
    scores with the scan path's own bm25_rank — results bit-identical to
    ``bm25_topk`` over the indexed corpus."""
    buckets = sorted({hash60_py(t, _TERM_SEED) % n_buckets for t in query_terms})
    postings = (
        spark.read.parquet(path.rstrip("/") + "/postings")
        .where(F.col("pbucket").isin(buckets))
        .where(F.col("term").isin(list(query_terms)))
        .select(id_col, "term", "tf")
    )
    docstats = spark.read.parquet(path.rstrip("/") + "/docstats")
    n = docstats.agg(F.count("*").alias("n_docs"))
    tot = docstats.agg(F.sum("dl").cast("double").alias("t"))
    dlen = docstats.select(id_col, "dl")
    return bm25_rank(postings, dlen, n, tot, id_col=id_col, k1=k1, b=b, top_n=top_n)


def bm25_batch(
    df: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
    exclude: DataFrame | None = None,
) -> DataFrame:
    """BM25 for a query WORKLOAD: ``queries`` is the exploded
    (query_id, term) table; ONE corpus token pass scores every query —
    (query_id, doc_id, matched, rank, score), rank per query.

    ``exclude`` — (query_id, doc_id) pairs dropped BEFORE ranking — turns
    this into the hard-negative miner for retriever training: pass the
    known positives and the result is each query's top-n highest-scoring
    NON-positives, ranks contiguous from 1.

    Scale shape: the corpus tf table is restricted to the workload's
    term set before anything fans out; the query fan-out is a broadcast
    join (workloads are small by contract — thousands of terms, not
    corpus-scale); per-term df is computed once for the workload, not
    per query; ranking is one window on the query partitioning.  Same
    bit-portability convention as bm25_topk (shared arithmetic shape,
    graded against the SQL twin)."""
    from pyspark.sql import Window

    q = queries.select("query_id", "term").distinct().localCheckpoint(eager=False)
    tf_all = _tf_table(df, text_col, id_col).localCheckpoint(eager=False)
    dlen = tf_all.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    tft = tf_all.join(F.broadcast(q.select("term").distinct()), "term")
    dfq = tft.groupBy("term").agg(F.count("*").alias("df_t"))
    n = df.agg(F.count("*").alias("n_docs"))
    tot = dlen.agg(F.sum("dl").cast("double").alias("t"))
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5))
    frac = (F.col("tf") * (F.lit(k1) + 1.0)) / (
        F.col("tf") + F.lit(k1) * (1.0 - F.lit(b) + F.lit(b) * (F.col("dl") / (F.col("t") / F.col("n_docs"))))
    )
    scored = (
        tft.join(F.broadcast(q), "term")
        .join(dlen, id_col)
        .join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(tot))
        .select("query_id", F.col(id_col), F.round(idf * frac * 1e6).cast("long").alias("c_e6"))
    )
    perdoc = scored.groupBy("query_id", id_col).agg(
        F.count("*").alias("matched"), F.sum("c_e6").alias("s_e6")
    )
    if exclude is not None:
        perdoc = perdoc.join(
            exclude.select("query_id", id_col), ["query_id", id_col], "left_anti"
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("s_e6"), id_col)
    return (
        perdoc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select(
            "query_id",
            id_col,
            "matched",
            "rank",
            (F.col("s_e6").cast("double") / 1e6).alias("score"),
        )
    )


def rrf_fuse(
    arms: dict[str, DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top_n: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of named
    ranked lists — hybrid retrieval's standard combiner: ``rrf(d) =
    Σ_arms 1/(k + rank_arm(d))``, absent-from-arm contributing 0.
    Output: (id, {name}_rank ... per arm, rrf_score) — the fused top-n.

    Why RRF and not score mixing: BM25 scores and cosine similarities
    live on incomparable scales; ranks don't.  The arms stay independent
    (lexical scan/index, ANN index) and fusion happens on their bounded
    top-N lists — at 100 TB the fuse join touches |arms|·N rows per
    query, never a corpus.

    Determinism: ranks are exact integers; each 1/(k+rank) is the same
    IEEE double on both engines; the fixed-order sum of |arms| such
    terms is engine-identical; the fused score rounds to 1e-9 and the
    top-n orders by (rounded score desc, id) — a total order."""
    fused: DataFrame | None = None
    rank_cols: list[str] = []
    for name, df in arms.items():
        rc = f"{name}_rank"
        rank_cols.append(rc)
        r = df.select(F.col(id_col), F.col(rank_col).cast("long").alias(rc))
        fused = r if fused is None else fused.join(r, id_col, "full_outer")
    score: Column | None = None
    for rc in rank_cols:
        term = F.coalesce(F.lit(1.0) / (F.lit(float(k)) + F.col(rc)), F.lit(0.0))
        score = term if score is None else score + term
    assert fused is not None and score is not None, "rrf_fuse needs >= 1 arm"
    return (
        fused.select(id_col, *rank_cols, F.round(score, 9).alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), id_col)
        .limit(top_n)
    )
