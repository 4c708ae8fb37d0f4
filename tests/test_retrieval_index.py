"""Inverted index + index-backed BM25 (operators/retrieval.py): the
query path must be BIT-IDENTICAL to the scan path (they share
text.bm25_rank), reads must prune to the query terms' partition buckets,
and incremental appends must keep the equality — no stored statistic to
go stale."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_event_tracker_spark.functions.hashing import hash60, hash60_py
from eth_event_tracker_spark.operators.retrieval import (
    _TERM_SEED,
    append_text_index,
    bm25_query,
    build_text_index,
)
from eth_event_tracker_spark.operators.text import bm25_topk
from eth_event_tracker_spark.tables import load_table

TERMS = ["vector", "stream", "merge"]


def _rows(df):
    return sorted((r.doc_id, r.matched, r.score) for r in df.collect())


def test_hash60_py_matches_spark(spark):
    vals = ["vector", "stream", "", "naïve-ünicode", "a b c"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r.s: r.h
        for r in df.select("s", hash60(F.col("s"), _TERM_SEED).alias("h")).collect()
    }
    for v in vals:
        assert got[v] == hash60_py(v, _TERM_SEED), v


def test_index_query_equals_scan_exactly(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    build_text_index(docs, str(tmp_path / "idx"))
    got = _rows(bm25_query(spark, str(tmp_path / "idx"), TERMS))
    want = _rows(bm25_topk(docs, TERMS))
    assert got == want and len(got) == 10


def test_index_query_prunes_partitions(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    build_text_index(docs, str(tmp_path / "idx"))
    df = bm25_query(spark, str(tmp_path / "idx"), TERMS)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    scan = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scan and any("pbucket" in l for l in scan), plan[:1500]
    # and the term filter reaches the parquet reader
    assert "PushedFilters" in plan and "term" in plan.split("PushedFilters", 1)[1][:200]


def test_incremental_append_keeps_equality(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    build_text_index(old, str(tmp_path / "idx"))
    append_text_index(new, str(tmp_path / "idx"))
    got = _rows(bm25_query(spark, str(tmp_path / "idx"), TERMS))
    want = _rows(bm25_topk(docs, TERMS))
    assert got == want


def test_docstats_counts_tokenless_docs(spark, tmp_path):
    """A doc with no tokens still counts toward N (the scan path counts
    every row of the corpus) — dl = 0 in docstats."""
    rows = [(0, "alpha beta alpha"), (1, ""), (2, "alpha")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    build_text_index(docs, str(tmp_path / "idx"))
    stats = {r.doc_id: r.dl for r in spark.read.parquet(str(tmp_path / "idx/docstats")).collect()}
    assert stats == {0: 3, 1: 0, 2: 1}
    assert _rows(bm25_query(spark, str(tmp_path / "idx"), ["alpha"])) == _rows(
        bm25_topk(docs, ["alpha"])
    )


# ---------------------------------------------------------------------------
# batch retrieval / hard-negative mining
# ---------------------------------------------------------------------------
def test_bm25_batch_equals_per_query_scan(spark, sf_dir):
    """Each workload query's slice is bit-identical to running
    bm25_topk for that query alone."""
    from eth_event_tracker_spark.operators.retrieval import bm25_batch

    docs = load_table(spark, sf_dir, "documents")
    workload = {0: ["vector", "stream"], 1: ["merge", "key", "table"]}
    q = spark.createDataFrame(
        [(qid, t) for qid, ts in workload.items() for t in ts], "query_id int, term string"
    )
    out = bm25_batch(docs, q, top_n=10).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.doc_id, r.matched, r.score))
    for qid, terms in workload.items():
        want = [(r.doc_id, r.matched, r.score) for r in bm25_topk(docs, terms, top_n=10).collect()]
        assert sorted(by_q[qid]) == sorted(want), qid


def test_bm25_batch_hard_negative_mining(spark, sf_dir):
    """exclude drops the positives BEFORE ranking: none appear, ranks
    stay contiguous from 1, and the survivors are exactly the unexcluded
    prefix of the full ranking."""
    from eth_event_tracker_spark.operators.retrieval import bm25_batch

    docs = load_table(spark, sf_dir, "documents")
    q = spark.createDataFrame([(0, "vector"), (0, "stream")], "query_id int, term string")
    full = bm25_batch(docs, q, top_n=20).collect()
    positives = [r.doc_id for r in full if r.rank <= 2]  # call the top-2 "known positives"
    excl = spark.createDataFrame([(0, d) for d in positives], "query_id int, doc_id long")
    mined = bm25_batch(docs, q, top_n=5, exclude=excl).collect()
    assert [r.rank for r in sorted(mined, key=lambda r: r.rank)] == [1, 2, 3, 4, 5]
    assert not {r.doc_id for r in mined} & set(positives)
    want = [r.doc_id for r in sorted(full, key=lambda r: r.rank) if r.doc_id not in positives][:5]
    assert [r.doc_id for r in sorted(mined, key=lambda r: r.rank)] == want


def test_compact_text_index_preserves_queries_and_shrinks_files(
    spark, sf_dir, tmp_path
):
    """Appends pile up per-bucket files; compaction rewrites them through
    the shared staged swap — query results bit-identical, file counts
    down, second run a no-op."""
    import os

    from eth_event_tracker_spark.operators.retrieval import compact_text_index

    docs = load_table(spark, sf_dir, "documents").localCheckpoint(eager=False)
    base = docs.where("doc_id % 4 = 0")
    idx = str(tmp_path / "idx")
    build_text_index(base, idx, n_buckets=8)
    for m in (1, 2, 3):
        append_text_index(docs.where(f"doc_id % 4 = {m}"), idx, n_buckets=8)

    def nfiles():
        total = 0
        for root, _, files in os.walk(idx):
            total += sum(f.endswith(".parquet") for f in files)
        return total

    before_files = nfiles()
    want = _rows(bm25_query(spark, idx, TERMS, n_buckets=8))
    done = compact_text_index(spark, idx, max_files=1, files_after=1)
    assert done > 0
    assert nfiles() < before_files
    assert _rows(bm25_query(spark, idx, TERMS, n_buckets=8)) == want
    # idempotent: everything already at files_after
    assert compact_text_index(spark, idx, max_files=1, files_after=1) == 0
    assert _rows(bm25_query(spark, idx, TERMS, n_buckets=8)) == want


def test_compact_text_index_crash_recovery(spark, sf_dir, tmp_path):
    """Constructed crash windows: a committed stage whose live partition
    vanished rolls FORWARD; an old copy with an uncommitted stage rolls
    BACK — recovery runs on the next locked entry (an append)."""
    import os
    import shutil

    from eth_event_tracker_spark.operators.retrieval import compact_text_index
    from eth_event_tracker_spark.store.filecompact import COMMIT, OLD, STAGE

    docs = load_table(spark, sf_dir, "documents").localCheckpoint(eager=False)
    idx = str(tmp_path / "idx")
    build_text_index(docs.where("doc_id % 2 = 0"), idx, n_buckets=4)
    want = _rows(bm25_query(spark, idx, TERMS, n_buckets=4))

    post = os.path.join(idx, "postings")
    name = next(n for n in sorted(os.listdir(post)) if n.startswith("pbucket="))
    live = os.path.join(post, name)

    # forward: stage a committed copy, delete the live partition
    stage = os.path.join(post, STAGE, name)
    shutil.copytree(live, stage)
    open(os.path.join(stage, COMMIT), "w").close()
    shutil.rmtree(live)
    append_text_index(docs.where("doc_id % 2 = 1"), idx, n_buckets=4)
    assert os.path.isdir(live) and not os.path.isdir(os.path.join(post, STAGE))

    # back: old copy present, stage uncommitted → old rolls back
    after_append = _rows(bm25_query(spark, idx, TERMS, n_buckets=4))
    old = os.path.join(post, OLD, name)
    shutil.copytree(live, old)
    shutil.rmtree(live)
    os.makedirs(os.path.join(post, STAGE, name))  # uncommitted debris
    assert compact_text_index(spark, idx, max_files=999) == 0
    assert os.path.isdir(live) and not os.path.isdir(os.path.join(post, OLD))
    assert _rows(bm25_query(spark, idx, TERMS, n_buckets=4)) == after_append
    assert want  # the pre-append result set was non-trivial
