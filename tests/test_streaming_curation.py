"""Incremental streaming curation: gate/redact/dedup running as a file
stream with the corpus as the cross-batch state — must be idempotent
under replay and equivalent to batch curation of the union."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from eth_event_tracker_spark.streaming.curation import (
    corpus_view,
    start_corpus_ingest,
)

SCHEMA = "doc_id long, text string, lang string, source string"


def _drop_file(path, rows):
    """Write one parquet FILE (not a directory): the file stream source
    does not recurse into non-partition subdirectories."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*rows))
    table = pa.table(
        {
            "doc_id": pa.array(cols[0], pa.int64()),
            "text": pa.array(cols[1], pa.string()),
            "lang": pa.array(cols[2], pa.string()),
            "source": pa.array(cols[3], pa.string()),
        }
    )
    pq.write_table(table, str(path))


def _run_available(spark, input_dir, corpus_dir, ckpt):
    q = start_corpus_ingest(
        spark, str(input_dir), str(corpus_dir), str(ckpt), available_now=True
    )
    q.awaitTermination(120)
    assert not q.isActive
    assert q.exception() is None, q.exception()


LONG = "spark row batch " * 12  # 36 words — passes the ≥20-word gate


def test_streaming_curation_dedup_and_replay(spark, tmp_path):
    inp, corpus, ckpt = tmp_path / "in", tmp_path / "corpus", tmp_path / "ckpt"
    inp.mkdir()

    # batch 1: a keeper, an exact in-batch dup of it, and a gate reject
    _drop_file(
        inp / "f1.parquet",
        [
            (1, LONG + "alpha", "en", "s0"),
            (2, LONG + "alpha", "en", "s0"),  # dup of 1 within the batch
            (3, "too short", "en", "s0"),  # gate reject
        ],
    )
    _run_available(spark, inp, corpus, ckpt)

    got = corpus_view(spark, str(corpus))
    assert {r.doc_id for r in got.select("doc_id").collect()} == {1}

    # batch 2: a cross-batch dup (same text as doc 1, new id) + new content
    # with an email that must be redacted before hashing/appending
    _drop_file(
        inp / "f2.parquet",
        [
            (10, LONG + "alpha", "en", "s1"),  # dup of corpus doc 1
            (11, LONG + "beta contact a@b.io now", "en", "s1"),
        ],
    )
    _run_available(spark, inp, corpus, ckpt)

    got = corpus_view(spark, str(corpus))
    assert {r.doc_id for r in got.select("doc_id").collect()} == {1, 11}
    beta = got.where(F.col("doc_id") == 11).collect()[0]
    assert "<EMAIL>" in beta.text and "a@b.io" not in beta.text

    # replay: wipe the checkpoint so the stream reprocesses EVERY file —
    # the content-addressed guard must keep the corpus unchanged
    shutil.rmtree(ckpt)
    _run_available(spark, inp, corpus, ckpt)
    got = corpus_view(spark, str(corpus))
    assert got.count() == 2
    assert {r.doc_id for r in got.select("doc_id").collect()} == {1, 11}

    # corpus layout: hash-prefix partitioned, hashes unique
    assert got.select("content_hash").distinct().count() == 2
    prefixes = {r.hash_prefix for r in got.select("hash_prefix").collect()}
    hashes = {r.content_hash for r in got.select("content_hash").collect()}
    # "p" guard keeps partition values string-typed under hive inference
    assert prefixes == {"p" + h[:2] for h in hashes}


def test_corrupted_corpus_fails_loud(spark, tmp_path):
    """A corpus that EXISTS but cannot be read must fail the batch, not
    silently skip the anti-join and append duplicates (the exactly-once
    guarantee would otherwise fail open)."""
    import pytest

    from eth_event_tracker_spark.streaming.curation import append_curated, curate_batch

    corpus = tmp_path / "corpus"
    batch = spark.createDataFrame(
        [(1, LONG + "gamma", "en", "s0")], SCHEMA
    )
    # plant garbage bytes inside the exact hash-prefix partition this
    # batch will probe — prefix pruning must not hide the corruption
    prefix = curate_batch(batch).select("hash_prefix").collect()[0][0]
    part = corpus / f"hash_prefix={prefix}"
    part.mkdir(parents=True)
    (part / "part-00000.parquet").write_bytes(b"this is not a parquet file")
    with pytest.raises(Exception) as ei:
        append_curated(spark, str(corpus), batch)
    # the failure is the corpus read surfacing, not a swallowed no-op
    assert "parquet" in str(ei.value).lower() or "footer" in str(ei.value).lower()
    # and nothing was appended: the only parquet under the corpus is still
    # the garbage file itself
    files = list(corpus.rglob("*.parquet"))
    assert files == [part / "part-00000.parquet"]


def test_empty_existing_corpus_dir_is_first_batch(spark, tmp_path):
    """An existing-but-empty corpus directory (e.g. created by an external
    orchestrator) behaves like the first batch: zero existing hashes, no
    inference error."""
    from eth_event_tracker_spark.streaming.curation import append_curated, corpus_view

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    batch = spark.createDataFrame([(1, LONG + "delta", "en", "s0")], SCHEMA)
    append_curated(spark, str(corpus), batch)
    assert {r.doc_id for r in corpus_view(spark, str(corpus)).select("doc_id").collect()} == {1}


def test_streaming_near_dup_admission_and_repair(spark, tmp_path):
    """Round 5: incremental near-dup admission. A near-copy of an
    already-admitted doc (different content hash, so the exact guard
    passes it) is dropped by estimated MinHash Jaccard against the
    persisted signature sidecar; disjoint-vocabulary docs survive; the
    ingest stays idempotent under replay; repair_sigs backfills a
    sidecar gap and is a no-op on a consistent one."""
    from eth_event_tracker_spark.streaming.curation import (
        _sigs_dir,
        append_curated,
        repair_sigs,
    )

    inp, corpus, ckpt = tmp_path / "in", tmp_path / "corpus", tmp_path / "ckpt"
    inp.mkdir()
    base = " ".join(f"word{i}" for i in range(40))
    other = " ".join(f"item{i}" for i in range(40))

    def run():
        q = start_corpus_ingest(
            spark, str(inp), str(corpus), str(ckpt),
            available_now=True, near_dup_threshold=0.8,
        )
        q.awaitTermination(120)
        assert q.exception() is None, q.exception()

    _drop_file(inp / "f1.parquet", [(1, base, "en", "s0"), (2, other, "en", "s0")])
    run()
    assert {r.doc_id for r in corpus_view(spark, str(corpus)).collect()} == {1, 2}
    sigs = spark.read.parquet(_sigs_dir(str(corpus)))
    assert {r.doc_id for r in sigs.select("doc_id").distinct().collect()} == {1, 2}

    # batch 2: near-copy of doc 1 (one appended word — J ≈ 0.975, above
    # the 13/16-seed bar), plus a disjoint-vocabulary fresh doc
    fresh = " ".join(f"thing{i}" for i in range(40))
    _drop_file(
        inp / "f2.parquet",
        [(10, base + " extra", "en", "s1"), (11, fresh, "en", "s1")],
    )
    run()
    assert {r.doc_id for r in corpus_view(spark, str(corpus)).collect()} == {1, 2, 11}

    # replay from a fresh checkpoint: all hashes already admitted → no
    # growth of corpus OR sidecar (sig append is guarded by survival)
    shutil.rmtree(ckpt)
    run()
    assert {r.doc_id for r in corpus_view(spark, str(corpus)).collect()} == {1, 2, 11}
    sigs = spark.read.parquet(_sigs_dir(str(corpus)))
    assert sigs.count() == 3 * 16  # k rows per admitted doc, no dupes

    # consistent sidecar → repair is a no-op
    assert repair_sigs(spark, str(corpus)) == 0

    # simulate the crash window: admit a doc with near-dup OFF (corpus
    # grows, sidecar does not), then repair backfills exactly that doc
    extra = " ".join(f"gadget{i}" for i in range(40))
    extra_df = spark.createDataFrame([(20, extra, "en", "s2")], SCHEMA)
    append_curated(spark, str(corpus), extra_df)  # no sigs written
    assert repair_sigs(spark, str(corpus)) == 1
    assert repair_sigs(spark, str(corpus)) == 0
    # and the backfilled signature now blocks its near-copies
    _drop_file(inp / "f3.parquet", [(21, extra + " tail", "en", "s3")])
    run()
    assert 21 not in {r.doc_id for r in corpus_view(spark, str(corpus)).collect()}


# ---------------------------------------------------------------------------
# bloom-guarded admission (the constant-size cross-batch guard)
# ---------------------------------------------------------------------------
def _run_bloom(spark, input_dir, corpus_dir, ckpt, bloom_dir):
    q = start_corpus_ingest(
        spark, str(input_dir), str(corpus_dir), str(ckpt),
        available_now=True, bloom_log_dir=str(bloom_dir),
    )
    q.awaitTermination(120)
    assert not q.isActive
    assert q.exception() is None, q.exception()


def test_bloom_guard_admits_identical_set(spark, tmp_path):
    """The bloom-guarded stream admits EXACTLY what the plain guard
    admits — across within-batch dups, cross-batch dups, replays, and
    novel docs — and the replayed batch appends nothing twice."""
    rows1 = [
        (1, LONG + "alpha", "en", "s0"),
        (2, LONG + "alpha", "en", "s0"),  # in-batch dup
        (3, "too short", "en", "s0"),  # gate reject
        (4, LONG + "beta", "en", "s1"),
    ]
    rows2 = [
        (5, LONG + "alpha", "en", "s2"),  # cross-batch dup of 1
        (6, LONG + "gamma", "de", "s2"),  # novel
    ]
    variants = {}
    for mode in ("plain", "bloom"):
        inp = tmp_path / f"in_{mode}"
        inp.mkdir()
        corpus, ckpt, bl = (
            tmp_path / f"c_{mode}", tmp_path / f"k_{mode}", tmp_path / f"b_{mode}"
        )
        run = (
            (lambda: _run_available(spark, inp, corpus, ckpt))
            if mode == "plain"
            else (lambda: _run_bloom(spark, inp, corpus, ckpt, bl))
        )
        _drop_file(inp / "f1.parquet", rows1)
        run()
        _drop_file(inp / "f2.parquet", rows2)
        run()
        run()  # replay with nothing new
        variants[mode] = {
            (r.doc_id, r.content_hash) for r in corpus_view(spark, str(corpus)).collect()
        }
    assert variants["bloom"] == variants["plain"]
    assert {d for d, _ in variants["bloom"]} == {1, 4, 6}


def test_bloom_guard_skips_corpus_read_for_novel_batches(spark, tmp_path, monkeypatch):
    """An all-novel batch never touches the corpus: every hash probes
    negative, so no prefix survives to the verify join.  Pinned by
    poisoning the corpus read after the first batch — the guarded stream
    must still ingest a second, fully-novel batch."""
    import eth_event_tracker_spark.streaming.curation as SC

    inp = tmp_path / "in"
    inp.mkdir()
    corpus, ckpt, bl = tmp_path / "c", tmp_path / "k", tmp_path / "b"
    _drop_file(inp / "f1.parquet", [(1, LONG + "alpha", "en", "s0")])
    _run_bloom(spark, inp, corpus, ckpt, bl)

    orig = spark.__class__.read

    def poisoned_read(self):
        import traceback

        reader = orig.fget(self)
        stack = "".join(traceback.format_stack())
        if "_bloom_guard" in stack:
            # the sketch read (reader.parquet) is legitimate; the CORPUS
            # read goes through reader.schema(...) — that one must not run
            def no_schema(*a, **k):
                raise AssertionError("corpus read attempted for an all-novel batch")

            reader.schema = no_schema
        return reader

    monkeypatch.setattr(spark.__class__, "read", property(poisoned_read))
    try:
        _drop_file(inp / "f2.parquet", [(9, LONG + "zeta", "en", "s1")])
        _run_bloom(spark, inp, corpus, ckpt, bl)
    finally:
        monkeypatch.setattr(spark.__class__, "read", orig)
    docs = {r.doc_id for r in corpus_view(spark, str(corpus)).collect()}
    assert docs == {1, 9}


def test_bloom_guard_requires_seed_on_existing_corpus(spark, tmp_path):
    import pytest

    from eth_event_tracker_spark.streaming.curation import seed_bloom_log

    inp = tmp_path / "in"
    inp.mkdir()
    corpus, ckpt = tmp_path / "c", tmp_path / "k"
    _drop_file(inp / "f1.parquet", [(1, LONG + "alpha", "en", "s0"), (2, LONG + "beta", "en", "s0")])
    _run_available(spark, inp, corpus, ckpt)  # plain stream built the corpus

    # enabling the guard with an empty log must refuse
    with pytest.raises(Exception) as ei:
        _run_bloom(spark, inp / "nothing-new", corpus, tmp_path / "k2", tmp_path / "b")
    # (the stream wraps the error; accept either surface)

    # seed, then the guarded stream takes over and still dedups exactly
    seed_bloom_log(spark, str(corpus), str(tmp_path / "b2"))
    inp2 = tmp_path / "in2"
    inp2.mkdir()
    _drop_file(
        inp2 / "f2.parquet",
        [(7, LONG + "alpha", "en", "s9"), (8, LONG + "delta", "en", "s9")],
    )
    _run_bloom(spark, inp2, corpus, tmp_path / "k3", tmp_path / "b2")
    docs = {r.doc_id for r in corpus_view(spark, str(corpus)).collect()}
    assert docs == {1, 2, 8}  # 7 is a cross-corpus dup, caught via the seed


# ---------------------------------------------------------------------------
# small-file compaction (compact_corpus)
# ---------------------------------------------------------------------------
def _pfiles(corpus, prefix_name):
    import os

    pdir = corpus / prefix_name
    return [f for f in os.listdir(pdir) if f.endswith(".parquet")]


def test_compact_corpus_preserves_rows_and_shrinks_files(spark, tmp_path):
    import os

    from eth_event_tracker_spark.streaming.curation import compact_corpus

    inp = tmp_path / "in"
    inp.mkdir()
    corpus, ckpt = tmp_path / "c", tmp_path / "k"
    # 6 batches, each appending one novel doc with IDENTICAL hash prefix
    # pressure: different texts land in different prefixes, so use many
    # docs per batch to populate prefixes repeatedly
    for b in range(6):
        _drop_file(
            inp / f"f{b}.parquet",
            [(100 * b + i, LONG + f"doc {b} {i}", "en", "s0") for i in range(8)],
        )
        _run_available(spark, inp, corpus, ckpt)
    before = {
        (r.doc_id, r.content_hash) for r in corpus_view(spark, str(corpus)).collect()
    }
    prefixes = [n for n in os.listdir(corpus) if n.startswith("hash_prefix=")]
    fat = [p for p in prefixes if len(_pfiles(corpus, p)) > 1]
    assert fat, "fixture should produce multi-file prefixes"

    n = compact_corpus(spark, str(corpus), max_files=1)
    assert n == len(fat)
    after = {
        (r.doc_id, r.content_hash) for r in corpus_view(spark, str(corpus)).collect()
    }
    assert after == before
    for p in prefixes:
        assert len(_pfiles(corpus, p)) == 1, p
    # second run: nothing left to do
    assert compact_corpus(spark, str(corpus), max_files=1) == 0

    # the stream keeps working after compaction and cross-batch dedup
    # still catches a re-crawl of compacted content
    _drop_file(inp / "g.parquet", [(9999, LONG + "doc 0 0", "en", "s9")])
    _run_available(spark, inp, corpus, ckpt)
    final = {r.doc_id for r in corpus_view(spark, str(corpus)).collect()}
    assert 9999 not in final and final == {d for d, _ in before}


def test_compact_recover_rolls_forward_and_back(spark, tmp_path):
    import os
    import shutil

    from eth_event_tracker_spark.streaming.curation import (
        _C_COMMIT,
        _C_OLD,
        _C_STAGE,
        _compact_recover,
        compact_corpus,
    )

    inp = tmp_path / "in"
    inp.mkdir()
    corpus, ckpt = tmp_path / "c", tmp_path / "k"
    for b in range(3):
        _drop_file(
            inp / f"f{b}.parquet",
            [(100 * b + i, LONG + f"dd {b} {i}", "en", "s0") for i in range(6)],
        )
        _run_available(spark, inp, corpus, ckpt)
    before = {r.doc_id for r in corpus_view(spark, str(corpus)).collect()}
    victims = [n for n in os.listdir(corpus) if n.startswith("hash_prefix=")][:2]
    va, vb = victims[0], victims[1] if len(victims) > 1 else victims[0]

    # crash state c: prefix renamed away, committed stage not installed
    stage = corpus / _C_STAGE / va
    stage.parent.mkdir(parents=True, exist_ok=True)
    spark.read.parquet(str(corpus / va)).coalesce(1).write.mode("overwrite").parquet(str(stage))
    open(stage / _C_COMMIT, "w").close()
    old = corpus / _C_OLD / va
    old.parent.mkdir(parents=True, exist_ok=True)
    os.rename(corpus / va, old)  # the swap's first rename happened...
    # ...and the crash hit before the second
    _compact_recover(str(corpus))
    assert (corpus / va).exists() and not (corpus / _C_STAGE).exists()
    assert {r.doc_id for r in corpus_view(spark, str(corpus)).collect()} == before

    # crash state: old copy stranded, stage UNcommitted → roll back
    if vb != va:
        stage2 = corpus / _C_STAGE / vb
        stage2.mkdir(parents=True)
        old2 = corpus / _C_OLD / vb
        old2.parent.mkdir(parents=True, exist_ok=True)
        os.rename(corpus / vb, old2)
        _compact_recover(str(corpus))
        assert (corpus / vb).exists()
        assert {r.doc_id for r in corpus_view(spark, str(corpus)).collect()} == before

    # and the next APPEND runs recovery too (the resurrect-then-discard
    # data-loss window): construct state c again, then stream a batch
    stage3 = corpus / _C_STAGE / va
    stage3.parent.mkdir(parents=True, exist_ok=True)
    spark.read.parquet(str(corpus / va)).coalesce(1).write.mode("overwrite").parquet(str(stage3))
    open(stage3 / _C_COMMIT, "w").close()
    old3 = corpus / _C_OLD / va
    old3.parent.mkdir(parents=True, exist_ok=True)
    shutil.rmtree(str(old3), ignore_errors=True)
    os.rename(corpus / va, old3)
    _drop_file(inp / "h.parquet", [(7777, LONG + "post crash novel", "en", "s1")])
    _run_available(spark, inp, corpus, ckpt)
    got = {r.doc_id for r in corpus_view(spark, str(corpus)).collect()}
    assert got == before | {7777}


def test_compact_corpus_covers_sig_sidecar(spark, tmp_path):
    """The _minhash_sigs sidecar compacts through the same staged swap,
    rows preserved, and near-dup admission still works after."""
    import os

    from eth_event_tracker_spark.streaming.curation import _sigs_dir, compact_corpus

    inp, corpus, ckpt = tmp_path / "in", tmp_path / "c", tmp_path / "k"
    inp.mkdir()

    def run():
        q = start_corpus_ingest(
            spark, str(inp), str(corpus), str(ckpt),
            available_now=True, near_dup_threshold=0.8,
        )
        q.awaitTermination(120)
        assert q.exception() is None, q.exception()

    texts = [" ".join(f"w{b}x{i}" for i in range(40)) for b in range(5)]
    for b, t in enumerate(texts):
        _drop_file(inp / f"f{b}.parquet", [(b, t, "en", "s0")])
        run()
    sd = _sigs_dir(str(corpus))
    before = sorted(
        (r.doc_id, r.seed, r.minhash) for r in spark.read.parquet(sd).collect()
    )
    n_files = len([f for f in os.listdir(sd) if f.endswith(".parquet")])
    assert n_files >= 5  # one-plus file sets per batch — the problem itself
    compact_corpus(spark, str(corpus), max_files=1)
    assert len([f for f in os.listdir(sd) if f.endswith(".parquet")]) == 1
    after = sorted(
        (r.doc_id, r.seed, r.minhash) for r in spark.read.parquet(sd).collect()
    )
    assert after == before
    # near-dup admission still consults the compacted sidecar
    _drop_file(inp / "g.parquet", [(99, texts[0] + " tail", "en", "s1")])
    run()
    assert 99 not in {r.doc_id for r in corpus_view(spark, str(corpus)).collect()}
