"""Integration test: the full corpus-curation pipeline on the fixture
documents table — every stage's invariant checked on real composed output,
not per-operator mocks."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_event_tracker_spark.curation import curate
from eth_event_tracker_spark.operators import text as OPT
from eth_event_tracker_spark.tables import load_table


def test_curate_end_to_end(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # duplicate every 10th doc under a new id so dedup has work to do
    dups = docs.where(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    corpus = docs.unionByName(dups)
    eval_df = docs.where(F.col("doc_id") % 10 == 7).select("doc_id", "text")

    res = curate(
        corpus,
        eval_df,
        contamination_max=0.5,
        mix_rates={"en": 1.0, "de": 1.0, "es": 1.0, "fr": 1.0},
        mix_default_rate=1.0,  # keep all strata: sampling must be a no-op drop
    )
    assert res.stages == [
        "quality_gate",
        "pii_redaction",
        "decontamination",
        "exact_dedup",
        "near_dup_cluster",
        "mixture_sample",
        "chunk_pack",
    ]

    kept_ids = {r.doc_id for r in res.kept.select("doc_id").collect()}
    corpus_ids = {r.doc_id for r in corpus.select("doc_id").collect()}
    assert kept_ids and kept_ids <= corpus_ids

    # ledger + kept partition the input: every doc is kept or dropped once
    dropped = res.dropped.collect()
    dropped_ids = {r.doc_id for r in dropped}
    assert kept_ids | dropped_ids == corpus_ids
    assert not kept_ids & dropped_ids
    by_stage = {}
    for r in dropped:
        by_stage.setdefault(r.stage, set()).add(r.doc_id)
    # rate-1.0 sampling with default 1.0 drops nothing
    assert "mixture_sample" not in by_stage
    # the planted exact duplicates all lost to their originals
    assert by_stage["exact_dedup"], "planted duplicates must be caught"
    assert all(d >= 100000 for d in by_stage["exact_dedup"])
    # eval docs (doc_id % 10 == 7) are fully contained in the eval set, so
    # none may survive curation (near-copies of eval docs may ALSO be
    # dropped here — that is the filter working, not an error)
    assert by_stage.get("decontamination"), "eval members must be flagged"
    assert not any(d % 10 == 7 for d in kept_ids)

    # no exact duplicates survive
    n_kept = res.kept.count()
    n_hash = (
        res.kept.select(F.sha2(OPT.normalize(F.col("text")), 256).alias("h"))
        .distinct()
        .count()
    )
    assert n_kept == n_hash

    # near-dup components keep exactly their canonical member
    for r in res.dup_pairs.collect():
        assert (r.cluster_id in kept_ids) or (r.cluster_id in dropped_ids)
        winners = {r.doc_a, r.doc_b} & kept_ids
        assert len(winners) <= 1, f"both sides of near-dup pair kept: {r}"

    # packed chunks come only from kept docs; seq ids are sane
    packed = res.packed
    chunk_doc_ids = {r.doc_id for r in packed.select("doc_id").distinct().collect()}
    assert chunk_doc_ids <= kept_ids
    assert packed.where((F.col("seq_id") < 0) | (F.col("shard") < 0)).count() == 0

    # redaction happened before chunking: no raw email survives in chunks
    assert packed.where(F.col("chunk").rlike(r"[\w.]+@[\w.]+\.\w+")).count() == 0


def test_curate_quality_keeper(spark, sf_dir):
    """keeper="quality": each near-dup cluster keeps its longest member
    (ties to lowest id); cluster count and survivor-per-cluster
    invariants match the min-id run, only the chosen survivor differs
    when lengths do."""
    docs = load_table(spark, sf_dir, "documents").limit(200)
    # plant near-dups: every 10th doc re-appears TRUNCATED under a higher
    # id — min-id keeps the long original; quality must as well, even if
    # the long one had the higher id
    near = (
        docs.where(F.col("doc_id") % 10 == 0)
        .withColumn("doc_id", F.col("doc_id") + 100000)
    )
    # and the reverse case: a LONGER variant under the higher id
    longer = (
        docs.where(F.col("doc_id") % 10 == 5)
        .withColumn("doc_id", F.col("doc_id") + 200000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" "), F.col("text")))
    )
    corpus = docs.unionByName(near).unionByName(longer)

    res_min = curate(corpus, keeper="min_id")
    res_q = curate(corpus, keeper="quality")

    kept_min = {r.doc_id for r in res_min.kept.select("doc_id").collect()}
    kept_q = {r.doc_id for r in res_q.kept.select("doc_id").collect()}
    assert len(kept_min) == len(kept_q), "same number of survivors per cluster"

    # Global invariant: within every near-dup cluster the quality keeper
    # maximizes word count, and all other stages are identical — so the
    # total word mass kept can only go UP vs the arbitrary min-id choice.
    # (The fixture also contains intrinsic near-dups, so survivors may
    # legitimately differ in original-doc clusters too.)
    def total_words(kept):
        return kept.select(
            F.sum(F.size(F.split(F.col("text"), " "))).alias("w")
        ).first().w

    assert total_words(res_q.kept) >= total_words(res_min.kept)
    # the planted doubled-text clusters guarantee at least one swap
    assert kept_q != kept_min


def test_curate_rejects_unknown_keeper(spark, sf_dir):
    import pytest as _pytest

    docs = load_table(spark, sf_dir, "documents").limit(10)
    with _pytest.raises(ValueError):
        curate(docs, keeper="newest")


def test_curate_cap_and_split_stages(spark, sf_dir):
    """Optional per-stratum cap + split assignment stages: cap bounds
    every source at the cap with an 'over_cap' ledger entry; the split
    stage adds a total, weights-valued split column and drops nothing."""
    docs = load_table(spark, sf_dir, "documents")
    res = curate(
        docs,
        source_cap=15,
        split_weights={"train": 0.8, "val": 0.1, "test": 0.1},
    )
    assert "stratum_cap" in res.stages and "split_assign" in res.stages
    per_source = res.kept.groupBy("source").count().collect()
    assert per_source and all(r["count"] <= 15 for r in per_source)
    # ledger accounting: every input doc is either kept or in the ledger
    kept_ids = {r.doc_id for r in res.kept.select("doc_id").collect()}
    dropped_ids = {r.doc_id for r in res.dropped.select("doc_id").collect()}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert kept_ids | dropped_ids == all_ids and not (kept_ids & dropped_ids)
    assert res.dropped.where("stage = 'stratum_cap' AND reason <> 'over_cap'").count() == 0
    assert res.dropped.where("stage = 'stratum_cap'").count() > 0
    # split: total function into the weight names, nothing dropped by it
    splits = {r.split for r in res.kept.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits


def test_curate_lm_quality_stage(spark, sf_dir):
    """Optional unigram-LM stage: a planted rare-token-soup doc is
    dropped with a 'low_logprob' ledger row; fluent docs survive; the
    stage is absent when the threshold is omitted."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").limit(100)
    # gibberish long enough to clear the rule-based gate (>= 20 words),
    # built from tokens that appear nowhere else in the corpus
    gibberish = " ".join(f"zxqv{i}wk" for i in range(30))
    planted = spark.createDataFrame(
        [(990001, gibberish, "en", "synthetic", len(gibberish))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    corpus = docs.unionByName(planted)

    res = curate(corpus, lm_logprob_min=-8.0)
    assert "lm_quality" in res.stages
    kept_ids = {r.doc_id for r in res.kept.select("doc_id").collect()}
    assert 990001 not in kept_ids
    lm_rows = res.dropped.where("stage = 'lm_quality'").collect()
    assert any(r.doc_id == 990001 and r.reason == "low_logprob" for r in lm_rows)
    # the stage is surgical: the fixture's fluent docs are untouched by it
    assert all(r.doc_id == 990001 for r in lm_rows)
    # ledger partition property still holds
    dropped_ids = {r.doc_id for r in res.dropped.select("doc_id").collect()}
    all_ids = {r.doc_id for r in corpus.select("doc_id").collect()}
    assert kept_ids | dropped_ids == all_ids and not (kept_ids & dropped_ids)

    # omitted threshold → no stage, no ledger rows
    res2 = curate(corpus)
    assert "lm_quality" not in res2.stages
    assert res2.dropped.where("stage = 'lm_quality'").count() == 0


def test_curate_temperature_upsample_stage(spark):
    """Round-6 advice #4: the upsampling half of mixture flattening wired
    into curate().  A tail stratum's post-pipeline count reflects the
    CLAMPED repeat factor; every extra copy lands in the ledger; copies
    carry repeat_idx through chunk+pack and spread across shards."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)

    def make(doc_id, lang):
        # 25 unique-ish words: clears the quality gate, never near-dups
        text = " ".join(f"w{doc_id}q{rng.randint(0, 9)}t{j}" for j in range(25))
        return (doc_id, text, lang, "synthetic", len(text))

    rows = (
        [make(i, "en") for i in range(600)]          # head: k = 1 exactly
        + [make(1000 + i, "de") for i in range(6)]    # √(600/6) = 10 exactly
        + [make(2000 + i, "yo") for i in range(2)]    # √(600/2) ≈ 17.3 → clamp 16
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )

    res = curate(docs, upsample=True, upsample_max_repeat=16.0)
    assert "temperature_upsample" in res.stages

    kept = res.kept.groupBy("lang").count().collect()
    by_lang = {r.lang: r["count"] for r in kept}
    assert by_lang == {"en": 600, "de": 60, "yo": 32}, by_lang

    # every extra copy (repeat_idx > 0) is ledgered as an addition
    extra = res.dropped.where("stage = 'temperature_upsample'").collect()
    assert len(extra) == (600 + 60 + 32) - 608
    assert all(r.reason == "upsampled_copy" for r in extra)

    # copies are distinguishable downstream and spread across shards
    packed = res.packed
    assert "repeat_idx" in packed.columns
    tail = packed.where(F.col("doc_id") == 2000)
    assert tail.select("repeat_idx").distinct().count() == 16
    assert tail.select("shard").distinct().count() > 1, "copies must not share one shard"

    # without the knob: no stage, no ledger rows, no repeat_idx column
    res2 = curate(docs)
    assert "temperature_upsample" not in res2.stages
    assert "repeat_idx" not in res2.kept.columns
    assert res2.dropped.where("stage = 'temperature_upsample'").count() == 0


def test_export_shards_roundtrip_manifest_and_validation(spark, tmp_path):
    """The export sink: partitioned write + atomic manifest; reread is
    multiset-identical; a filter on shard prunes partitions; tampering
    is caught by validate_shards; a manifest-less dir refuses to read."""
    import json
    import os
    import shutil

    import pytest

    from eth_event_tracker_spark.operators import export as OPE
    from eth_event_tracker_spark.operators.text import chunk_documents, pack_sequences

    rows = [(i, " ".join(f"w{i}t{j}" for j in range(25)), "en", "s", 1) for i in range(200)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    packed = pack_sequences(chunk_documents(docs), budget_words=64, n_shards=8)

    out = tmp_path / "corpus"
    manifest = OPE.export_shards(packed, str(out))
    assert manifest["total_rows"] == packed.count()
    assert manifest["n_shards"] == packed.select("shard").distinct().count()
    assert manifest["total_words"] == packed.agg(F.sum("n_words")).first()[0]
    on_disk = json.load(open(out / "_MANIFEST.json"))
    assert on_disk == manifest

    # reread: multiset-identical to the input
    back = OPE.read_shards(spark, str(out))
    a = sorted(map(tuple, packed.select(*sorted(packed.columns)).collect()))
    b = sorted(map(tuple, back.select(*sorted(packed.columns)).collect()))
    assert a == b

    # shard filter prunes to one hive partition (dataloader read path)
    one = back.where(F.col("shard") == manifest["shards"][0]["shard"])
    assert one.count() == manifest["shards"][0]["rows"]
    plan = one._sc._jvm.PythonSQLUtils.explainString(
        one._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "shard" in plan.split("PartitionFilters", 1)[1][:200]

    # validation green, then tamper: a deleted shard dir is flagged
    assert OPE.validate_shards(spark, str(out)) == {"ok": True, "problems": []}
    victim = manifest["shards"][0]["shard"]
    shutil.rmtree(out / f"shard={victim}")
    report = OPE.validate_shards(spark, str(out))
    assert not report["ok"]
    assert any(f"shard {victim}" in p and "missing" in p for p in report["problems"])

    # crashed export (no manifest) refuses to read
    os.remove(out / "_MANIFEST.json")
    with pytest.raises(FileNotFoundError, match="refusing"):
        OPE.read_shards(spark, str(out))

    # overwrite mode replaces cleanly and reinstalls the manifest
    m2 = OPE.export_shards(packed, str(out), mode="overwrite")
    assert m2["total_rows"] == manifest["total_rows"]
    assert OPE.validate_shards(spark, str(out))["ok"]


def test_export_shards_empty_corpus(spark, tmp_path):
    """Round-7 review: a fully-filtered corpus must export a valid
    zero-shard manifest and round-trip (schema carried in the manifest),
    not crash on schema inference over a data-free directory."""
    from eth_event_tracker_spark.operators import export as OPE

    empty = spark.createDataFrame(
        [], "doc_id long, chunk_id long, chunk string, n_words long, shard long, seq_id long"
    )
    out = tmp_path / "empty_corpus"
    manifest = OPE.export_shards(empty, str(out))
    assert manifest["n_shards"] == 0 and manifest["total_rows"] == 0
    back = OPE.read_shards(spark, str(out))
    assert back.count() == 0
    assert sorted(back.columns) == sorted(empty.columns)
    assert OPE.validate_shards(spark, str(out)) == {"ok": True, "problems": []}


def test_curate_corpus_extension_stage(spark, sf_dir):
    """filter_against drops exactly the docs already in the existing
    corpus (Bloom-prefiltered exact filter-against), ledgers them as
    already_in_corpus, and leaves the rest of the pipeline untouched."""
    docs = load_table(spark, sf_dir, "documents")
    existing = docs.where(F.col("doc_id") % 3 == 0)  # the curated corpus
    # incoming batch: fresh docs + re-crawls of corpus members
    fresh = docs.where(F.col("doc_id") % 3 == 1)
    recrawl = existing.withColumn("doc_id", F.col("doc_id") + 500000)
    incoming = fresh.unionByName(recrawl)

    res = curate(incoming, filter_against=existing)
    assert res.stages[0] == "corpus_extension"

    dropped_here = {
        r.doc_id
        for r in res.dropped.where(F.col("stage") == "corpus_extension").collect()
    }
    recrawl_ids = {r.doc_id for r in recrawl.select("doc_id").collect()}
    assert dropped_here == recrawl_ids  # every re-crawl, only re-crawls

    kept_ids = {r.doc_id for r in res.kept.select("doc_id").collect()}
    assert not kept_ids & recrawl_ids
    # the admitted fresh docs flow through the normal stages: identical
    # survivors to running curate on the fresh half alone
    want = {r.doc_id for r in curate(fresh).kept.select("doc_id").collect()}
    assert kept_ids == want


def test_curate_lm_order2_catches_scrambled_text(spark, sf_dir):
    """lm_order=2 swaps in the bigram model: a scrambled-word doc whose
    TOKENS are all corpus-common (great unigrams, broken transitions)
    is dropped by the bigram filter at a threshold the fluent corpus
    clears.  The unigram filter at the same threshold cannot separate
    it (that is the point of the second order)."""
    from pyspark.sql import functions as F

    from eth_event_tracker_spark.operators.text import bigram_logprob

    docs = load_table(spark, sf_dir, "documents").limit(100)
    # a repeated fluent sentence (its own bigrams recur 4×, supporting
    # themselves in the corpus model) vs the SAME word multiset
    # seed-shuffled — aperiodic, so nearly every transition is novel
    # (an interleave/reversal would NOT work: interleaving a periodic
    # sequence is still periodic, its bigrams self-support just as well)
    import random

    fluent_words = ("the value of the table and the row of the data " * 4).split()
    shuffled = list(fluent_words)
    random.Random(0).shuffle(shuffled)
    scrambled = " ".join(shuffled)
    planted = spark.createDataFrame(
        [
            (990011, " ".join(fluent_words), "en", "synthetic", 200),
            (990012, scrambled, "en", "synthetic", 200),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    corpus = docs.unionByName(planted)

    # pick a threshold between the two planted docs' bigram scores
    scores = {
        r["doc_id"]: r["logprob"]
        for r in bigram_logprob(planted.unionByName(docs)).collect()
        if r["doc_id"] in (990011, 990012)
    }
    assert scores[990012] < scores[990011], "scrambling must cost log-prob"
    thr = (scores[990011] + scores[990012]) / 2

    res = curate(corpus, lm_logprob_min=thr, lm_order=2)
    kept_ids = {r.doc_id for r in res.kept.select("doc_id").collect()}
    assert 990011 in kept_ids and 990012 not in kept_ids
    lm_rows = res.dropped.where("stage = 'lm_quality'").collect()
    assert any(r.doc_id == 990012 and r.reason == "low_logprob" for r in lm_rows)

    # invalid order is rejected loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="lm_order"):
        curate(corpus, lm_logprob_min=-5.0, lm_order=3)
