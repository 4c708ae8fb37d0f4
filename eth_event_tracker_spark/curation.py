"""End-to-end training-corpus curation: the operators composed the way a
pre-training data pipeline actually runs them.

    raw docs
      → quality gate          (rule-based keep/drop, text.quality_verdicts)
      → PII redaction         (text.redact_pii — redacted text flows on)
      → LM quality filter     (text.unigram_logprob or bigram_logprob
                               ≥ threshold, optional)
      → decontamination       (text.ngram_decontaminate vs an eval set)
      → exact dedup           (dedup.exact_dedup — content-hash keep-min)
      → near-dup clustering   (dedup.minhash_lsh_dedup → dup_clusters,
                               keep each component's canonical doc)
      → per-stratum cap       (splits.per_stratum_cap — bound mega-domains)
      → stratified sampling   (sampling.stratified_sample, mixture rates)
      → split assignment      (splits.leakage_safe_split — train/val/test,
                               text-coherent so any residual exact dups
                               can never straddle the eval boundary)
      → temperature upsample  (sampling.temperature_upsample — optional,
                               repeats tail strata toward √n with a
                               clamped factor; extra copies ledgered)
      → chunk + pack          (text.chunk_documents → text.pack_sequences)
      → shard export          (operators/export.export_shards — the
                               materialization sink: hive-partitioned
                               shards + validated manifest; not run here,
                               the caller owns the output location)

Every stage is lazy DataFrame composition — one ``CurationResult`` holds
the curated corpus, the dataloader-ready packed chunks, and per-stage
drop ledgers for auditability. No stage collects to the driver (the
clustering rounds inside ``dup_clusters`` are the one documented
bounded-iteration exception).

Scale notes: gate/redact/sample are shuffle-free projections or filtered
scans; decontamination is a broadcast semi-join; the dedups meet pairs
via equality joins only (see docs/SCALE.md §5, §10). The pipeline
inherits those shapes — no stage introduces a new shuffle class.

No counterpart in the reference (its pipeline is chain ingest); this is
the LLM-data surface of the engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import bloom as OPB
from .operators import dedup as OPD
from .operators import text as OPT
from .operators.sampling import stratified_sample, temperature_upsample
from .operators.splits import leakage_safe_split, per_stratum_cap


@dataclass
class CurationResult:
    """Outputs of :func:`curate`. All DataFrames are lazy."""

    kept: DataFrame  # curated docs (doc_id, text=redacted, lang, source, ...)
    packed: DataFrame  # chunk manifest + packing plan (doc_id, chunk_id, chunk, n_words, shard, seq_id)
    dropped: DataFrame  # ledger: (doc_id, stage, reason) per dropped doc (plus one row per upsampled extra copy, reason="upsampled_copy")
    dup_pairs: DataFrame  # verified near-dup pairs with cluster ids
    stages: list[str] = field(default_factory=list)

    def audit(self) -> dict[str, int]:
        """Materialize per-stage drop counts (actions — call sparingly)."""
        rows = self.dropped.groupBy("stage", "reason").count().collect()
        out = {f"{r['stage']}:{r['reason']}": r["count"] for r in rows}
        out["kept"] = self.kept.count()
        return out


def _ledger(df: DataFrame, stage: str, reason_col) -> DataFrame:
    return df.select(
        "doc_id", F.lit(stage).alias("stage"), reason_col.alias("reason")
    )


def curate(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    *,
    filter_against: DataFrame | None = None,
    contamination_max: float = 0.2,
    lm_logprob_min: float | None = None,
    lm_order: int = 1,
    jaccard_threshold: float = 0.8,
    mix_rates: dict[str, float] | None = None,
    mix_default_rate: float = 0.0,
    upsample: bool = False,
    upsample_max_repeat: float = 16.0,
    stratum_col: str = "lang",
    source_cap: int | None = None,
    cap_stratum_col: str = "source",
    split_weights: dict[str, float] | None = None,
    chunk_words: int = 32,
    overlap: int = 8,
    budget_words: int = 64,
    n_shards: int = 32,
    keeper: str = "min_id",
) -> CurationResult:
    """Run the full curation pipeline over ``docs`` (needs doc_id, text;
    ``stratum_col`` only if ``mix_rates`` is given).

    ``filter_against`` enables the corpus-extension admission stage:
    docs whose normalized text already exists in that (already-curated)
    corpus are dropped first, via the Bloom-prefiltered exact
    filter-against (ledger stage ``corpus_extension``, reason
    ``already_in_corpus``).

    ``eval_df`` enables the decontamination stage; ``lm_logprob_min``
    enables the LM quality filter (docs whose mean log-prob under the
    corpus's own model falls below the threshold are dropped —
    gibberish and rare-token soup score low); ``lm_order`` picks the
    model: 1 = unigram (CCNet-class), 2 = add-1 bigram, which also
    catches scrambled-word text whose unigram statistics are fine;
    ``mix_rates`` enables the mixture-sampling stage; ``upsample``
    enables the UPSAMPLING half of mixture flattening (round-6 advice
    #4): tail ``stratum_col`` strata are repeated toward √n proportions
    via :func:`operators.sampling.temperature_upsample`, the repeat
    factor clamped at ``upsample_max_repeat``; ``kept`` gains a
    ``repeat_idx`` column, each extra copy is recorded in the ledger
    (stage ``temperature_upsample``, reason ``upsampled_copy`` — an
    addition ledger, not a drop), and chunk+pack carries ``repeat_idx``
    through so copies spread across training shards instead of packing
    back-to-back; ``source_cap`` enables the per-stratum cap (at most
    that many docs per ``cap_stratum_col`` value);
    ``split_weights`` (e.g. ``{"train": .9, "val": .05, "test": .05}``)
    adds a text-coherent ``split`` column to ``kept`` — each skips
    cleanly when omitted.
    ``keeper`` picks the near-dup survivor per cluster: ``"min_id"``
    (the canonical component label) or ``"quality"`` (highest
    quality-score member via :func:`operators.dedup.select_keepers` —
    near-dup groups surrender their worst members, not their newest).
    """
    if keeper not in ("min_id", "quality"):
        raise ValueError(f"keeper must be 'min_id' or 'quality', got {keeper!r}")
    stages: list[str] = []
    ledgers: list[DataFrame] = []
    cur = docs

    # 0. corpus-extension admission (optional): drop docs whose normalized
    # text already exists in ``filter_against`` — the already-curated
    # corpus this batch extends.  First because it is the cheapest drop
    # (constant-size Bloom broadcast, unshuffled corpus probe, exact
    # verify join — operators/bloom.py) and because a doc the corpus
    # already holds must not re-enter regardless of downstream verdicts.
    if filter_against is not None:
        stages.append("corpus_extension")
        admitted = OPB.bloom_filter_against(filter_against, cur)
        ledgers.append(
            _ledger(
                cur.join(admitted.select("doc_id"), "doc_id", "left_anti"),
                "corpus_extension",
                F.lit("already_in_corpus"),
            )
        )
        cur = admitted

    # 1. quality gate ------------------------------------------------------
    stages.append("quality_gate")
    verdicts = OPT.quality_verdicts(cur)
    ledgers.append(
        _ledger(verdicts.where(F.col("verdict") != "keep"), "quality_gate", F.col("verdict"))
    )
    cur = cur.join(
        verdicts.where(F.col("verdict") == "keep").select("doc_id"), "doc_id", "left_semi"
    )

    # 2. PII redaction (transforms, drops nothing) -------------------------
    stages.append("pii_redaction")
    red = OPT.redact_pii(cur)
    cur = red.drop("text", "n_email", "n_phone", "n_ipv4").withColumnRenamed(
        "redacted", "text"
    )

    # 2b. LM quality: unigram log-prob filter (CCNet-class) ----------------
    # Runs on the REDACTED text so the scored tokens are exactly the kept
    # tokens (redaction tags count like any other token on both sides).
    # ``lm_order=2`` swaps in the add-1-smoothed bigram model — the
    # second-order filter that also catches scrambled-word text whose
    # unigram statistics are fine (operators/text.py bigram_logprob).
    if lm_logprob_min is not None:
        if lm_order not in (1, 2):
            raise ValueError(f"lm_order must be 1 or 2, got {lm_order!r}")
        stages.append("lm_quality")
        score = OPT.unigram_logprob if lm_order == 1 else OPT.bigram_logprob
        lm = score(cur)
        low = lm.where(F.col("logprob") < lm_logprob_min)
        ledgers.append(_ledger(low, "lm_quality", F.lit("low_logprob")))
        cur = cur.join(low.select("doc_id"), "doc_id", "left_anti")

    # 3. decontamination ---------------------------------------------------
    if eval_df is not None:
        stages.append("decontamination")
        # redact the eval side identically: train text is already redacted,
        # and n-grams spanning a <EMAIL>/<PHONE>/<IPV4> tag must still match
        # their eval counterparts or contamination is systematically diluted
        eval_red = (
            OPT.redact_pii(eval_df)
            .drop("text", "n_email", "n_phone", "n_ipv4")
            .withColumnRenamed("redacted", "text")
        )
        contam = OPT.ngram_decontaminate(cur, eval_red)
        dirty = contam.where(F.col("contamination") > contamination_max)
        ledgers.append(_ledger(dirty, "decontamination", F.lit("eval_overlap")))
        cur = cur.join(dirty.select("doc_id"), "doc_id", "left_anti")

    # 4. exact dedup -------------------------------------------------------
    stages.append("exact_dedup")
    deduped = OPD.exact_dedup(cur).drop("content_hash")
    ledgers.append(
        _ledger(
            cur.join(deduped.select("doc_id"), "doc_id", "left_anti"),
            "exact_dedup",
            F.lit("exact_duplicate"),
        )
    )
    cur = deduped

    # 5. near-dup clustering: keep each component's canonical (min-id) doc -
    stages.append("near_dup_cluster")
    # localCheckpoint, not cache(): CacheManager entries persist until an
    # explicit unpersist, so per-call cache() leaks across invocations;
    # checkpoint blocks are released by the ContextCleaner on GC
    pairs = OPD.minhash_lsh_dedup(cur, threshold=jaccard_threshold).localCheckpoint(
        eager=False
    )
    clusters = OPD.dup_clusters(pairs)
    if keeper == "quality":
        # near-dup variants usually differ by truncation/boilerplate;
        # keep the longest member (word count as the quality proxy)
        scores = OPT.quality_scores(cur).select(
            "doc_id", F.col("n_words").cast("double").alias("quality")
        )
        keepers = OPD.select_keepers(clusters, scores)
        losers = clusters.join(
            keepers.select(F.col("keeper_id").alias("doc_id")), "doc_id", "left_anti"
        )
    else:
        losers = clusters.where(F.col("doc_id") != F.col("cluster_id"))
    ledgers.append(_ledger(losers, "near_dup_cluster", F.lit("near_duplicate")))
    dup_pairs = pairs.join(clusters, pairs["doc_a"] == clusters["doc_id"]).select(
        "doc_a", "doc_b", "jaccard", "cluster_id"
    )
    cur = cur.join(losers.select("doc_id"), "doc_id", "left_anti")

    # 5b. per-stratum cap: bound mega-domains before mixture math ----------
    if source_cap is not None:
        stages.append("stratum_cap")
        capped = per_stratum_cap(cur, source_cap, stratum_col=cap_stratum_col)
        ledgers.append(
            _ledger(
                cur.join(capped.select("doc_id"), "doc_id", "left_anti"),
                "stratum_cap",
                F.lit("over_cap"),
            )
        )
        cur = capped

    # 6. stratified mixture sampling ---------------------------------------
    if mix_rates is not None:
        stages.append("mixture_sample")
        sampled = stratified_sample(
            cur, mix_rates, stratum_col=stratum_col, default_rate=mix_default_rate
        )
        ledgers.append(
            _ledger(
                cur.join(sampled.select("doc_id"), "doc_id", "left_anti"),
                "mixture_sample",
                F.lit("not_sampled"),
            )
        )
        cur = sampled

    # 6b. split assignment (transforms, drops nothing) ---------------------
    if split_weights is not None:
        stages.append("split_assign")
        cur = leakage_safe_split(cur, split_weights, coherence_col="text")

    # 6c. temperature upsampling: repeat tail strata toward √n -------------
    # After the split so a doc's copies inherit ONE split (copies
    # straddling train/eval would be self-contamination by construction).
    if upsample:
        stages.append("temperature_upsample")
        cur = temperature_upsample(
            cur, stratum_col=stratum_col, max_repeat=upsample_max_repeat
        )
        ledgers.append(
            _ledger(
                cur.where(F.col("repeat_idx") > 0),
                "temperature_upsample",
                F.lit("upsampled_copy"),
            )
        )

    # 7. chunk + pack ------------------------------------------------------
    stages.append("chunk_pack")
    pass_cols = ("repeat_idx",) if upsample else ()
    chunks = OPT.chunk_documents(
        cur, chunk_words=chunk_words, overlap=overlap, keep_cols=pass_cols
    )
    packed = OPT.pack_sequences(
        chunks,
        budget_words=budget_words,
        n_shards=n_shards,
        salt_col="repeat_idx" if upsample else None,
    )

    dropped = ledgers[0]
    for extra in ledgers[1:]:
        dropped = dropped.unionByName(extra)
    return CurationResult(
        kept=cur, packed=packed, dropped=dropped, dup_pairs=dup_pairs, stages=stages
    )
