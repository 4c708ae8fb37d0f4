"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the 100 TB story):
  - exact:   one shuffle on the content hash; map-side nothing to combine,
             but the hash key is uniform → no skew.
  - jaccard: exact pairwise verification joins on *shingle* — only docs
             sharing a shingle ever meet. Still O(sum of bucket²) worst
             case; at scale it runs AFTER LSH candidate pruning.
  - minhash: signatures are per-(doc, seed) min-aggregates (map-side
             combine); LSH banding turns all-pairs into equality joins on
             band keys — the only quadratic step is within a band bucket,
             which the band width controls.
  - simhash: per-doc 64-bit signature; near-dup = Hamming ≤ r, blocked by
             splitting the signature into (r+1) chunks (pigeonhole: any
             pair within r shares an exact chunk) → equality joins again.

Every hash here is the engine-portable sha-based hash60, so minhash/LSH
results are *exactly* reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60
from .text import normalize, word_shingles, words


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on normalized content hash: keep the smallest id per
    group. Returns the surviving rows."""
    h = F.sha2(normalize(F.col(text_col)), 256)
    w = Window.partitionBy("content_hash").orderBy(F.col(id_col))
    return (
        df.withColumn("content_hash", h)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def corpus_dup_heavy(
    df: DataFrame, text_col: str = "text", shingles: DataFrame | None = None
) -> bool:
    """ONE cheap scalar decides whether the identical-content
    pre-collapse pays for itself: heavy ⟺ the approximate count of
    distinct normalized texts sits more than 10 % below the row count.

    The collapse's candidate-volume saving scales with the SQUARE of
    the exact-duplicate factor while its cost (a per-doc hash
    aggregate, a tiny group shuffle, and the pair re-expansion) is a
    handful of metadata-width stages — on a duplicate-light corpus the
    stages are pure overhead, on a crawl-shaped one they are the
    difference between O(buckets²) and O(distinct-buckets²).  Both
    plans produce bit-identical output, so this is a runtime plan
    choice in the AQE spirit, made from a measured statistic instead
    of doctrine.  approx_count_distinct at rsd 2 % keeps the decision
    deterministic for a given dataset and leaves ≥5σ between a
    duplicate-free corpus and the 10 % margin.

    The verdict is memoized ON the shingle-table object when one is
    passed — the registry entries share one session-scoped cached
    shingle table per sf_dir, so the whole dedup family pays the
    decision aggregate once per session."""
    if shingles is not None:
        hit = getattr(shingles, "_eets_dup_heavy", None)
        if hit is not None:
            return hit
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(normalize(F.col(text_col)), 0.02).alias("d"),
    ).first()
    heavy = bool(row.n and (row.n - row.d) > 0.10 * row.n)
    if shingles is not None:
        shingles._eets_dup_heavy = heavy
    return heavy


def _dup_text_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Collapse documents with IDENTICAL normalized text to one
    representative: (rep = min member id, members = sorted ids), one
    row per distinct content.

    This is the exact-duplicate pre-collapse the simhash/embedding
    tiers already run (round-9 verdict finding #1) applied to the
    shingle-join family: a crawl-scale corpus is duplicate-heavy, and
    every shingle/prefix/band bucket's candidate count grows with the
    SQUARE of the duplication factor, while shingle sets — and so
    Jaccard, containment, minhash signatures and band keys — are pure
    functions of normalize(text).  Members are therefore
    interchangeable with their representative in every pair
    computation.  The group key is exact_dedup's content hash
    (sha-256 of the normalized text); docs whose normalized text is
    empty produce no shingles and so no pairs — they are excluded so
    the expansion cannot invent pairs the shingle join never sees.
    That filter is EXACT, not approximate: word_shingles pads any doc
    shorter than n words with one whole-text shingle
    (sequence(0, greatest(size-n, 0)), oracle CTE identical), so
    "has ≥1 shingle" ⟺ normalize(text) != '' — identical sub-n-word
    docs DO meet in the uncollapsed shingle join and the intra
    expansion is allowed to emit them (pinned bit-equal either way in
    tests/test_round12.py).
    Shuffle shape (guide §2.3): one scan of the doc table, one
    metadata-width (hash, id) exchange — payloads never move."""
    return (
        df.where(normalize(F.col(text_col)) != "")
        .select(F.col(id_col), F.sha2(normalize(F.col(text_col)), 256).alias("_fp"))
        .groupBy("_fp")
        .agg(F.sort_array(F.collect_list(id_col)).alias("members"))
        .select(F.col("members").getItem(0).alias("rep"), "members")
        .localCheckpoint(eager=False)
    )


def _expand_member_pairs(
    rep_pairs: DataFrame,
    groups: DataFrame,
    intra: dict[str, "F.Column"] | None = None,
) -> DataFrame:
    """Expand representative-level UNORDERED pairs (doc_a < doc_b) to
    member level: a cross-group member pair inherits its reps' value
    columns verbatim (the pair measure depends only on the two shingle
    sets), and every within-group pair — identical sets — is emitted
    with the literal columns in ``intra`` (e.g. jaccard = 1.0, which is
    bit-equal to the oracle's s/s division).  Pass ``intra=None`` for
    value-less pair sets (candidates).  Each unordered member pair is
    emitted exactly once: groups partition the doc ids, and rep pairs
    are unique per group pair."""
    val_cols = [c for c in rep_pairs.columns if c not in ("doc_a", "doc_b")]
    ga = groups.select(F.col("rep").alias("doc_a"), F.col("members").alias("_ms_a"))
    gb = groups.select(F.col("rep").alias("doc_b"), F.col("members").alias("_ms_b"))
    cross = (
        rep_pairs.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(F.explode("_ms_a").alias("_ma"), "_ms_b", *val_cols)
        .select("_ma", F.explode("_ms_b").alias("_mb"), *val_cols)
        .select(
            F.least("_ma", "_mb").alias("doc_a"),
            F.greatest("_ma", "_mb").alias("doc_b"),
            *val_cols,
        )
    )
    intra_vals = [c.alias(name) for name, c in (intra or {}).items()]
    intra_df = (
        groups.where(F.size("members") > 1)
        .select(F.posexplode("members").alias("_i", "_ma"), "members")
        .select(
            "_ma",
            F.explode(F.expr("slice(members, _i + 2, size(members))")).alias("_mb"),
        )
        .select(F.col("_ma").alias("doc_a"), F.col("_mb").alias("doc_b"), *intra_vals)
    )
    return cross.unionByName(intra_df)


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
    shingles: DataFrame | None = None,
    collapse_identical: bool | None = None,
) -> DataFrame:
    """All pairs with word-n-gram Jaccard ≥ threshold.

    Pairs meet through a join on shingle (never a cross join). Pass
    ``candidates`` (doc_a, doc_b) to restrict verification to an LSH
    candidate set — the scale path — and ``shingles`` to reuse an
    already-materialized shingle table instead of re-deriving it.

    ``candidates`` contract: unordered pairs, each represented once with
    ``doc_a < doc_b``.  A defensive distinct below makes duplicate
    candidate rows harmless (a duplicate would otherwise double-count
    every co-shingle into n_inter); a row with doc_a > doc_b is the
    caller's bug — it would report the pair in the swapped orientation.

    ``collapse_identical`` (exhaustive path only — a caller passing
    ``candidates`` has already chosen its population): identical
    normalized texts collapse to one representative before the shingle
    self-join and member pairs expand afterwards
    (:func:`_dup_text_groups`), so the co-shingle bucket joins no
    longer square with the exact-duplicate factor.  ``None`` (default)
    decides adaptively from the measured duplicate density
    (:func:`corpus_dup_heavy`).  Bit-equality: cross-group pairs reuse
    the reps' n_inter/n_a/n_b integers; a within-group pair's jaccard
    is s/(s+s−s) = 1.0 exactly."""
    sh = shingles if shingles is not None else word_shingles(df, text_col, n, id_col)
    if candidates is None and collapse_identical is None:
        collapse_identical = corpus_dup_heavy(df, text_col, shingles)
    if candidates is None and collapse_identical:
        sh = sh.localCheckpoint(eager=False)  # rep join + verification below
        groups = _dup_text_groups(df, text_col, id_col)
        sh_rep = sh.join(groups.select(F.col("rep").alias(id_col)), id_col)
        rep_pairs = jaccard_pairs(
            df, threshold, n, text_col, id_col,
            candidates=None, shingles=sh_rep, collapse_identical=False,
        )
        return _expand_member_pairs(rep_pairs, groups, {"jaccard": F.lit(1.0)})
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    if candidates is not None:
        candidates = candidates.select("doc_a", "doc_b").distinct()
        # candidate-DRIVEN verification: start from the (small) candidate
        # pair set and pull in each side's shingles, so the intersection
        # count touches only candidate docs' shingles — the full shingle
        # self-join (which materializes every co-shingle pair in the
        # corpus before pruning) never happens.  This is the shape that
        # survives 100 TB: work is O(candidates × shingles-per-doc), not
        # O(sum of shingle-bucket²).
        pairs = candidates.join(a, "doc_a").join(b, ["doc_b", "shingle"])
    else:
        pairs = a.join(b, "shingle").where(F.col("doc_a") < F.col("doc_b"))
    inter = pairs.groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_inter"))
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingles: DataFrame | None = None,
    collapse_identical: bool | None = None,
) -> DataFrame:
    """ORDERED pairs (doc_a, doc_b, containment) with shingle containment
    |S(a) ∩ S(b)| / |S(a)| ≥ threshold — Broder's asymmetric companion to
    Jaccard resemblance.  The measure a dedup pass needs when one doc is
    EMBEDDED in another (quote farms, wrapper pages, doc+boilerplate):
    a 50-shingle doc fully contained in a 5000-shingle page has Jaccard
    ≈ 0.01 (invisible to ``jaccard_pairs``) but containment 1.0.

    Same no-cross-join scale shape as :func:`jaccard_pairs`: unordered
    pairs meet ONCE via the shingle equi-join (doc_a < doc_b), the
    intersection count aggregates once, and both orientations then emit
    from that single table with their own denominators — the ordered
    output never doubles the join.

    ``collapse_identical``: same identical-content pre-collapse as
    :func:`jaccard_pairs` (``None`` = adaptive via
    :func:`corpus_dup_heavy`), with an ORDERED expansion — a
    cross-group member pair keeps its reps' orientation and containment
    value (denominators depend only on the sets), and within-group
    ordered pairs emit both directions with containment s/s = 1.0
    exactly."""
    sh = shingles if shingles is not None else word_shingles(df, text_col, n, id_col)
    if collapse_identical is None:
        collapse_identical = corpus_dup_heavy(df, text_col, shingles)
    if collapse_identical:
        sh = sh.localCheckpoint(eager=False)  # rep join + verification below
        groups = _dup_text_groups(df, text_col, id_col)
        sh_rep = sh.join(groups.select(F.col("rep").alias(id_col)), id_col)
        rep = containment_pairs(
            df, threshold, n, text_col, id_col,
            shingles=sh_rep, collapse_identical=False,
        )
        ga = groups.select(F.col("rep").alias("doc_a"), F.col("members").alias("_ms_a"))
        gb = groups.select(F.col("rep").alias("doc_b"), F.col("members").alias("_ms_b"))
        cross = (
            rep.join(ga, "doc_a")
            .join(gb, "doc_b")
            .select(F.explode("_ms_a").alias("_ma"), "_ms_b", "containment")
            .select("_ma", F.explode("_ms_b").alias("_mb"), "containment")
            .select(
                F.col("_ma").alias("doc_a"),
                F.col("_mb").alias("doc_b"),
                "containment",
            )
        )
        intra = (
            groups.where(F.size("members") > 1)
            .select(F.explode("members").alias("doc_a"), "members")
            .select("doc_a", F.explode("members").alias("doc_b"))
            .where(F.col("doc_a") != F.col("doc_b"))
            .select("doc_a", "doc_b", F.lit(1.0).alias("containment"))
        )
        return cross.unionByName(intra)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    sized = inter.join(sa, "doc_a").join(sb, "doc_b")
    fwd = sized.select(
        "doc_a",
        "doc_b",
        (F.col("n_inter").cast("double") / F.col("n_a").cast("double")).alias("containment"),
    )
    rev = sized.select(
        F.col("doc_b").alias("doc_a"),
        F.col("doc_a").alias("doc_b"),
        (F.col("n_inter").cast("double") / F.col("n_b").cast("double")).alias("containment"),
    )
    return fwd.unionByName(rev).where(F.col("containment") >= threshold)


def jaccard_pairs_prefix(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingles: DataFrame | None = None,
    collapse_identical: bool | None = None,
) -> DataFrame:
    """Exact Jaccard ≥ threshold pairs via PREFIX FILTERING — the
    AllPairs/PPJoin candidate rule (Bayardo/Ma/Srikant, WWW 2007): same
    output as :func:`jaccard_pairs`, strictly smaller candidate set.

    Rule: order each doc's shingles by ascending global document
    frequency (rarest first; ties by shingle value — a canonical total
    order), keep only the first ``|s| − ⌈t·|s|⌉ + 1`` as the doc's
    PREFIX, and generate candidates by equality join on prefix tokens
    plus the length filter ``t·|a| ≤ |b| ≤ |a|/t``.  Completeness: J ≥ t
    forces an overlap ≥ ⌈t·max(|a|,|b|)⌉, and two sets with overlap ≥ α
    must share a token within their first ``|x| − α + 1`` tokens of any
    common total order — so every qualifying pair survives, while the
    any-shared-token join explodes on exactly the tokens the prefix rule
    skips (the frequent ones).  Both ⌈·⌉ and the length bounds take a
    1e-9 slack so float rounding can only widen the candidate set, never
    drop a true pair; verification (the shared candidate-driven
    :func:`jaccard_pairs` tail) is exact either way.

    100 TB shape: candidate volume is Σ per-token prefix-bucket², and
    prefix tokens are by construction the RARE ones — the frequency-sorted
    order exists precisely to keep those buckets small.  One extra
    frequency aggregate + one per-doc rank window over the shingle
    table; everything else is shared with the any-share path.

    ``collapse_identical``: exact duplicates make every one of their
    (rare!) prefix tokens a hot key — prefix buckets, and so candidate
    volume, grow with the SQUARE of the duplication factor, which is
    precisely the regime a crawl corpus lives in.  The
    identical-content pre-collapse (:func:`_dup_text_groups`; ``None``
    = adaptive via :func:`corpus_dup_heavy`) runs the whole
    freq/prefix/verify pipeline on one representative per distinct
    content and expands member pairs afterwards.  The prefix rule
    stays complete: document frequency over the collapsed table is
    still a common total order over shingles (any such order preserves
    the theorem), and the verification is exact regardless."""
    sh = shingles if shingles is not None else word_shingles(df, text_col, n, id_col)
    if collapse_identical is None:
        collapse_identical = corpus_dup_heavy(df, text_col, shingles)
    sh = sh.localCheckpoint(eager=False)  # three consumers below
    groups = None
    if collapse_identical:
        groups = _dup_text_groups(df, text_col, id_col)
        sh = sh.join(groups.select(F.col("rep").alias(id_col)), id_col).localCheckpoint(
            eager=False
        )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df_t"))
    w = Window.partitionBy(id_col).orderBy("df_t", "shingle")
    t = F.lit(float(threshold))
    plen = (
        F.col("n_sh")
        - F.ceil(t * F.col("n_sh").cast("double") - F.lit(1e-9))
        + 1
    )
    prefix = (
        sh.join(freq, "shingle")
        .withColumn("_rnk", F.row_number().over(w))
        .join(sizes, id_col)
        .where(F.col("_rnk") <= plen)
        .select(id_col, "shingle", "n_sh")
    )
    a = prefix.select(
        F.col(id_col).alias("doc_a"), "shingle", F.col("n_sh").alias("n_a")
    )
    b = prefix.select(
        F.col(id_col).alias("doc_b"), "shingle", F.col("n_sh").alias("n_b")
    )
    cand = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(F.col("n_b").cast("double") >= t * F.col("n_a").cast("double") - 1e-9)
        .where(F.col("n_a").cast("double") >= t * F.col("n_b").cast("double") - 1e-9)
        .select("doc_a", "doc_b")
        .distinct()
    )
    verified = jaccard_pairs(
        df, threshold, n, text_col, id_col, candidates=cand, shingles=sh
    )
    if groups is None:
        return verified
    return _expand_member_pairs(verified, groups, {"jaccard": F.lit(1.0)})


# MinHash permutation family: one portable sha-based hash per shingle,
# then k affine permutations over its two 30-bit halves,
#   m_i = (A_i*h_hi + B_i*h_lo + C_i) mod P,   P = 2^31 - 1 (prime).
# All operands < 2^31 and h_hi/h_lo < 2^30, so every product stays under
# 2^61 — exact in int64 on BOTH engines (DuckDB raises on BIGINT
# overflow; Spark wraps silently — neither can happen here).  Constants
# are fixed multiplicative-hash-style values shared verbatim with the
# DuckDB oracle (queries/llmdata.py builds its CTE from this list).
MINHASH_P = 2_147_483_647


def minhash_perm_consts(k: int = 16) -> list[tuple[int, int, int]]:
    return [
        (
            (2_654_435_761 * (i + 1) + 1) % MINHASH_P,
            (2_246_822_519 * (i + 1) + 3) % MINHASH_P,
            (3_266_489_917 * (i + 1) + 7) % MINHASH_P,
        )
        for i in range(k)
    ]


def minhash_signatures(
    df: DataFrame,
    k: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, seed, minhash) for k portable hash permutations.

    Scale shape: ONE sha256 per shingle (not k — the prior form exploded
    every shingle row k times and hashed each copy, a k× blowup of both
    CPU and shuffle input) and the k minima run as k min-aggregates over
    the un-exploded shingle table with map-side combine; the tiny
    (#docs × k) unpivot happens after aggregation."""
    sh = shingles if shingles is not None else word_shingles(df, text_col, n, id_col)
    h = hash60(F.col("shingle"), 0)
    halves = sh.select(
        id_col,
        F.shiftright(h, 30).alias("hhi"),
        h.bitwiseAND(F.lit((1 << 30) - 1)).alias("hlo"),
    )
    perms = minhash_perm_consts(k)
    mins = halves.groupBy(id_col).agg(
        *[
            F.min(
                (F.lit(a) * F.col("hhi") + F.lit(b) * F.col("hlo") + F.lit(c)) % F.lit(MINHASH_P)
            ).alias(f"m{i}")
            for i, (a, b, c) in enumerate(perms)
        ]
    )
    return mins.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).cast("int").alias("seed"), F.col(f"m{i}").alias("minhash"))
                    for i in range(k)
                ]
            )
        ).alias("sm"),
    ).select(id_col, "sm.seed", "sm.minhash")


def band_keys(sigs: DataFrame, band_rows: int = 4, id_col: str = "doc_id") -> DataFrame:
    """(id, band, band_key): band key = joined minhashes of ``band_rows``
    consecutive seeds.  Docs sharing any band key are LSH candidates —
    the equality-join key for both the self-join (lsh_candidates) and the
    corpus-vs-incoming join (minhash_filter_against)."""
    return (
        sigs.withColumn("band", F.expr(f"seed DIV {band_rows}"))
        .groupBy(id_col, "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                    lambda s: s["minhash"].cast("string"),
                ),
                ",",
            ).alias("band_key")
        )
    )


def lsh_candidates(
    sigs: DataFrame, band_rows: int = 4, id_col: str = "doc_id",
    collapse_identical: bool | None = None,
) -> DataFrame:
    """Band the signature; docs sharing any band key are candidates.

    ``collapse_identical``: docs with an IDENTICAL full signature (every
    band key equal — what exact duplicates produce) collapse to one
    representative before the band self-join and expand afterwards, so
    band buckets stop squaring with the duplication factor.  The
    returned candidate SET is bit-identical: an identical-signature
    pair shares all its bands (always a candidate, emitted by the
    intra expansion), and a cross-group pair shares a band key iff its
    representatives do (band keys depend only on the signature).
    ``None`` decides adaptively from the measured distinct-signature
    density (the signature analogue of :func:`corpus_dup_heavy`);
    callers that already collapsed their population upstream, or
    already know the corpus duplication, pass the boolean."""
    banded = band_keys(sigs, band_rows, id_col).localCheckpoint(eager=False)
    groups = None
    if collapse_identical is not False:
        sig_of = F.concat_ws(
            "|",
            F.transform(
                F.array_sort(F.collect_list(F.struct("band", "band_key"))),
                lambda s: s["band_key"],
            ),
        )
        per_doc = (
            banded.groupBy(id_col)
            .agg(sig_of.alias("_sig"))
            .localCheckpoint(eager=False)
        )
        if collapse_identical is None:
            row = per_doc.agg(
                F.count(F.lit(1)).alias("n"),
                F.approx_count_distinct("_sig", 0.02).alias("d"),
            ).first()
            collapse_identical = bool(row.n and (row.n - row.d) > 0.10 * row.n)
    if collapse_identical:
        groups = (
            per_doc.groupBy("_sig")
            .agg(F.sort_array(F.collect_list(id_col)).alias("members"))
            .select(F.col("members").getItem(0).alias("rep"), "members")
            .localCheckpoint(eager=False)
        )
        banded = banded.join(groups.select(F.col("rep").alias(id_col)), id_col)
    # both sides of the self-join — without the lineage cut the whole
    # signature pipeline runs twice
    a = banded.select(F.col(id_col).alias("doc_a"), "band", "band_key")
    b = banded.select(F.col(id_col).alias("doc_b"), "band", "band_key")
    cand = (
        a.join(b, ["band", "band_key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    if groups is not None:
        return _expand_member_pairs(cand, groups)
    return cand


def minhash_lsh_dedup(
    df: DataFrame,
    threshold: float = 0.8,
    k: int = 16,
    band_rows: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingles: DataFrame | None = None,
    collapse_identical: bool | None = None,
) -> DataFrame:
    """Full pipeline: shingle → minhash → LSH bands → candidate pairs →
    exact Jaccard verification ≥ threshold.  The shingle table is
    materialized once and shared between signature generation and
    verification — at 100 TB it would be a persisted intermediate table.

    ``collapse_identical``: the identical-content pre-collapse
    (:func:`_dup_text_groups`; ``None`` = adaptive via
    :func:`corpus_dup_heavy`) runs signatures, banding AND the
    Jaccard verification on one representative per distinct content,
    expanding member pairs only at the very end — candidate
    volume, verification joins and the n_inter aggregate all stop
    squaring with the exact-duplicate factor.  Bit-equality as in
    :func:`jaccard_pairs`: signatures and Jaccard depend only on the
    shingle set (a pure function of the normalized text); within-group
    pairs (always candidates — identical signatures share every band)
    carry jaccard s/s = 1.0 exactly.

    Internal intermediates use localCheckpoint, not cache(): a cache()
    here would add a CacheManager entry per invocation with no owner to
    unpersist it, leaking executor storage across repeated curate() /
    registered-query calls.  localCheckpoint blocks are released by the
    ContextCleaner when the DataFrame is garbage collected.  Callers that
    already manage a shingle table pass it via ``shingles`` and keep
    their own lifecycle."""
    sh = (
        shingles
        if shingles is not None
        else word_shingles(df, text_col, n, id_col).localCheckpoint(eager=False)
    )
    if collapse_identical is None:
        collapse_identical = corpus_dup_heavy(df, text_col, shingles)
    groups = None
    if collapse_identical:
        groups = _dup_text_groups(df, text_col, id_col)
        # reps are already content-distinct — the signature-level
        # collapse inside lsh_candidates would only re-find (a subset
        # of) the same groups, so pass False below either way
        sh = sh.join(groups.select(F.col("rep").alias(id_col)), id_col).localCheckpoint(
            eager=False
        )
    sigs = minhash_signatures(df, k, n, text_col, id_col, shingles=sh)
    cands = lsh_candidates(
        sigs, band_rows, id_col, collapse_identical=False
    ).localCheckpoint(eager=False)
    verified = jaccard_pairs(
        df, threshold, n, text_col, id_col, candidates=cands, shingles=sh
    )
    if groups is None:
        return verified
    return _expand_member_pairs(verified, groups, {"jaccard": F.lit(1.0)})


def minhash_filter_against(
    corpus: DataFrame,
    incoming: DataFrame,
    threshold: float = 0.8,
    k: int = 16,
    band_rows: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_bands: DataFrame | None = None,
    corpus_shingles: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric near-dup filter: drop every ``incoming`` doc whose
    word-n-gram Jaccard vs ANY ``corpus`` doc is ≥ threshold; return the
    surviving incoming rows.  This is the corpus-extension shape — dedup
    a new crawl against the existing training corpus — where the
    symmetric pipeline (minhash_lsh_dedup) would re-pair the whole
    corpus against itself for no reason.

    Scale shape: candidates meet through a band-key EQUALITY join
    between the incoming side's bands and the corpus side's; the corpus
    never self-joins and its rows never shuffle beyond the per-doc
    signature/shingle aggregates.  At 100 TB, ``corpus_bands`` and
    ``corpus_shingles`` are persisted tables maintained incrementally as
    batches are admitted (streaming/curation keeps exact-hash state the
    same way) — pass them in and the corpus side costs one equality
    join, zero recompute.  Verification is candidate-driven, identical
    to jaccard_pairs: O(candidates × shingles/doc).

    The two id spaces may overlap (they are different tables); pairs are
    keyed (doc_new, doc_ref) and never compared for identity."""
    sh_in = word_shingles(incoming, text_col, n, id_col).localCheckpoint(eager=False)
    if corpus_shingles is None:
        corpus_shingles = word_shingles(corpus, text_col, n, id_col).localCheckpoint(
            eager=False
        )
    if corpus_bands is None:
        corpus_bands = band_keys(
            minhash_signatures(corpus, k, n, text_col, id_col, shingles=corpus_shingles),
            band_rows,
            id_col,
        )
    in_bands = band_keys(
        minhash_signatures(incoming, k, n, text_col, id_col, shingles=sh_in),
        band_rows,
        id_col,
    )
    cand = (
        in_bands.select(F.col(id_col).alias("doc_new"), "band", "band_key")
        .join(
            corpus_bands.select(F.col(id_col).alias("doc_ref"), "band", "band_key"),
            ["band", "band_key"],
        )
        .select("doc_new", "doc_ref")
        .distinct()
        .localCheckpoint(eager=False)
    )
    # candidate-driven cross-side Jaccard (the two-table form of
    # jaccard_pairs): intersection counts touch only candidate docs'
    # shingles on each side
    a = sh_in.select(F.col(id_col).alias("doc_new"), "shingle")
    b = corpus_shingles.select(F.col(id_col).alias("doc_ref"), "shingle")
    inter = (
        cand.join(a, "doc_new")
        .join(b, ["doc_ref", "shingle"])
        .groupBy("doc_new", "doc_ref")
        .agg(F.count("*").alias("n_inter"))
    )
    sz_in = sh_in.groupBy(id_col).agg(F.count("*").alias("n_new")).withColumnRenamed(
        id_col, "doc_new"
    )
    sz_c = corpus_shingles.groupBy(id_col).agg(
        F.count("*").alias("n_ref")
    ).withColumnRenamed(id_col, "doc_ref")
    doomed = (
        inter.join(sz_in, "doc_new")
        .join(sz_c, "doc_ref")
        .where(
            F.col("n_inter").cast("double")
            / (F.col("n_new") + F.col("n_ref") - F.col("n_inter")).cast("double")
            >= threshold
        )
        .select(F.col("doc_new").alias(id_col))
        .distinct()
    )
    return incoming.join(doomed, id_col, "left_anti")


def dup_clusters(pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b", max_iter: int = 30) -> DataFrame:
    """Connected components over near-dup pairs: every doc gets the min
    doc id of its component as ``cluster_id`` (the canonical keeper).

    This is the step that turns pairwise near-dup evidence into an actual
    dedup decision — pairs alone can chain (A~B, B~C) and a keep-one-per-
    pair rule would keep too many/few.

    Algorithm: min-label propagation with pointer jumping. Each round
    every node takes the min label over itself, its neighbors' labels,
    AND its own label's label (path compression — the "pointer jumping"
    of Kiveris et al., "Connected Components in MapReduce and Beyond"),
    so convergence is O(log diameter) rounds, not O(diameter): a
    1000-link chain of incrementally-edited near-dups converges in ~10
    rounds. Terminates when the global label sum stops changing (the sum
    is strictly decreasing until fixpoint); raises if max_iter rounds
    pass without convergence — unconverged labels would silently split
    components. Each round is two equality-join shuffles + one groupBy;
    labels are localCheckpoint()ed so lineage stays O(1) and
    re-evaluation is impossible (a prior bug class: multi-branch plans
    re-sampling nondeterministic lineage).

    No counterpart in the reference (its store is an ordered log, not a
    corpus); this is the LLM-data surface.
    """
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    rev = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    edges = fwd.union(rev).distinct().cache()
    # Initialization fuses the first propagation round: every node appears
    # as a dst (edges are symmetric), so comp₀ = min(self, neighbors) is
    # one groupBy — near-clique components are already converged here.
    # lazy checkpoints throughout: the convergence-sum action is what
    # materializes (and persists) each round's labels, so every round
    # costs ONE job, not a checkpoint job plus a sum job
    labels = (
        edges.groupBy("dst")
        .agg(F.min("src").alias("nmin"))
        .select(F.col("dst").alias("id"), F.least(F.col("dst"), F.col("nmin")).alias("comp"))
    ).localCheckpoint(eager=False)
    # convergence scalar in decimal: label ids may be 60-bit hashes
    # (operators/entity.py), whose long sum overflows under ANSI mode
    prev_sum = labels.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]
    converged = False
    for _ in range(max_iter):
        msgs = edges.join(labels, edges["src"] == labels["id"]).select(
            F.col("dst").alias("id"), "comp"
        )
        # pointer jumping: my label's current label is also a candidate
        jump = (
            labels.alias("l")
            .join(labels.alias("m"), F.col("l.comp") == F.col("m.id"))
            .select(F.col("l.id").alias("id"), F.col("m.comp").alias("comp"))
        )
        labels = (
            labels.unionByName(msgs)
            .unionByName(jump)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
        ).localCheckpoint(eager=False)
        cur_sum = labels.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"dup_clusters did not converge in {max_iter} rounds — "
            "unconverged labels would silently split components"
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("comp").alias("cluster_id"))


def select_keepers(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality",
) -> DataFrame:
    """Quality-aware keeper per near-dup cluster: instead of the
    canonical min-id keeper (``cluster_id`` itself), keep the member
    with the highest ``score_col`` (ties → lowest id, so the choice is
    total and deterministic).  The standard refinement real curation
    pipelines apply on top of connected components — near-dup groups
    should surrender their *worst* members, not their newest.

    Shape: clusters ⋈ scores on id (both keyed tables), one window
    partitioned by cluster_id — each partition is one near-dup group
    (small by construction), so the sort is per-group, never global.
    Rows: (cluster_id, keeper_id, keeper_score)."""
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        clusters.join(scores, id_col)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "cluster_id",
            F.col(id_col).alias("keeper_id"),
            F.col(score_col).alias("keeper_score"),
        )
    )


def simhash64(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """63-bit SimHash over word shingles: bit b of the signature is the
    majority vote of bit b across all shingle hashes.  All 63 bits come
    from ONE sha256 digest per shingle (a sha256 has 256 bits and this
    needs 63 — two digests was pure waste, and sha dominates the
    signature cost): bits 0..59 from the first 15 hex chars (the
    portable hash60 encoding), bits 60..62 from the 16th hex char.  Bit
    63 is left clear to stay inside a signed int64.  The DuckDB oracle
    derives the bits identically (queries/llmdata.py dedup_simhash)."""
    sh = shingles if shingles is not None else word_shingles(df, text_col, n, id_col)
    # materialize the sha digest ONCE per shingle; the 63 bit-vote
    # columns then read cheap integer ops off h0/h1 instead of re-running
    # sha256 per bit (a 60x expression-duplication trap)
    hashed = sh.select(
        id_col, F.sha2(F.concat(F.lit("0:"), F.col("shingle")), 256).alias("dg")
    ).select(
        id_col,
        F.conv(F.substring("dg", 1, 15), 16, 10).cast("long").alias("h0"),
        F.conv(F.substring("dg", 16, 1), 16, 10).cast("long").alias("h1"),
    )
    h0, h1 = F.col("h0"), F.col("h1")
    bits = [F.when(h0.bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1).alias(f"b{b}") for b in range(60)]
    bits += [F.when(h1.bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1).alias(f"b{60 + b}") for b in range(3)]
    voted = hashed.select(id_col, *bits).groupBy(id_col).agg(
        *[F.sum(f"b{i}").alias(f"s{i}") for i in range(63)]
    )
    sig = voted.select(
        id_col,
        sum(
            (F.when(F.col(f"s{i}") > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(1 << i) for i in range(63)),
            start=F.lit(0),
        ).cast("long").alias("simhash"),
    )
    return sig


def _simhash_pair_join(sigs: DataFrame, max_hamming: int, id_col: str) -> DataFrame:
    """Pigeonhole-blocked pair join over a (id, simhash) table: split the
    signature into max_hamming+1 chunks; any qualifying pair matches
    exactly on ≥1 chunk.  Returns (doc_a, doc_b, hamming), doc_a < doc_b."""
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    chunks = sigs.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftright("simhash", c * width).bitwiseAND(F.lit((1 << width) - 1)).alias("chunk"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("ck"),
    ).select(id_col, "simhash", "ck.chunk_id", "ck.chunk")
    a = chunks.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sig_a"), "chunk_id", "chunk")
    b = chunks.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sig_b"), "chunk_id", "chunk")
    cand = (
        a.join(b, ["chunk_id", "chunk"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_near_dups(
    df: DataFrame, max_hamming: int = 3, collapse_identical: bool = True, **kw
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming, blocked by the
    pigeonhole principle (``_simhash_pair_join``).

    ``collapse_identical`` (default on, round-9 verdict finding #1):
    group IDENTICAL signatures before the chunk self-join and expand
    member pairs afterwards — the same exact-duplicate pre-collapse the
    LSH/SemDeDup embedding tiers use (similarity._expand_exact_groups).
    A crawl-scale corpus is duplicate-heavy and identical texts produce
    identical signatures, so every chunk bucket's candidate count grows
    with the SQUARE of the duplication factor; with the collapse the
    join sees one representative per signature.  Bit-equality with the
    uncollapsed join is exact and integer-only: identical signatures
    always share every chunk (candidates by construction, Hamming 0),
    and a cross-group member pair's Hamming equals its representatives'
    (XOR depends only on the signatures).  Pair ENUMERATION stays
    inherently quadratic in per-cluster duplicate count — output-volume-
    bound pipelines should consume :func:`simhash_clusters` (the
    (doc, cluster) decision form, linear in docs) instead."""
    id_col = kw.get("id_col", "doc_id")
    # both sides of the chunk self-join read sigs — cut lineage so the
    # shingle-hash + 63-vote pipeline runs once, not twice
    sigs = simhash64(df, **kw).localCheckpoint(eager=False)
    if not collapse_identical:
        return _simhash_pair_join(sigs, max_hamming, id_col)
    groups = (
        sigs.groupBy("simhash")
        .agg(F.sort_array(F.collect_list(id_col)).alias("members"))
        .localCheckpoint(eager=False)
    )
    reps = groups.select(F.col("members").getItem(0).alias(id_col), "simhash")
    rep_pairs = _simhash_pair_join(reps, max_hamming, id_col)
    intra = (
        groups.where(F.size("members") > 1)
        .select(F.posexplode("members").alias("i", "ma"), "members")
        .select("ma", F.explode(F.expr("slice(members, i + 2, size(members))")).alias("mb"))
        .select(
            F.col("ma").alias("doc_a"),
            F.col("mb").alias("doc_b"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    ga = groups.select(F.col("members").getItem(0).alias("doc_a"), F.col("members").alias("ms_a"))
    gb = groups.select(F.col("members").getItem(0).alias("doc_b"), F.col("members").alias("ms_b"))
    cross = (
        rep_pairs.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(F.explode("ms_a").alias("ma"), "ms_b", "hamming")
        .select("ma", F.explode("ms_b").alias("mb"), "hamming")
        .select(
            F.least("ma", "mb").alias("doc_a"),
            F.greatest("ma", "mb").alias("doc_b"),
            "hamming",
        )
    )
    return cross.unionByName(intra)


def simhash_clusters(df: DataFrame, max_hamming: int = 3, **kw) -> DataFrame:
    """SimHash near-dup DECISION form: (doc_id, cluster_id) where
    cluster_id = MIN doc id in the Hamming-≤-r connected component — the
    keeper-selection contract every dedup tier shares (dup_clusters).

    This is the output-volume fix for the pair tier (round-9 verdict
    finding #1: 2.37M emitted pairs at sf≈3, growing quadratically with
    duplicate density): components over the REPRESENTATIVE graph plus a
    per-signature membership join emit one row per clustered DOC, linear
    in the corpus no matter how dense the duplication.  Identical-
    signature groups with ≥2 members form a cluster even when their
    representative has no near-dup edge (its members are exact
    signature-duplicates of each other); the component label of a
    member equals its representative's label because the representative
    IS the group's minimum id."""
    id_col = kw.get("id_col", "doc_id")
    sigs = simhash64(df, **kw).localCheckpoint(eager=False)
    groups = (
        sigs.groupBy("simhash")
        .agg(F.min(id_col).alias("rep"), F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    reps = groups.select(F.col("rep").alias(id_col), "simhash")
    rep_pairs = _simhash_pair_join(reps, max_hamming, id_col)
    comps = dup_clusters(rep_pairs, "doc_a", "doc_b")
    labeled = (
        groups.join(comps.withColumnRenamed("doc_id", "rep"), "rep", "left")
        .withColumn(
            "cluster",
            F.coalesce("cluster_id", F.when(F.col("cnt") > 1, F.col("rep"))),
        )
        .where(F.col("cluster").isNotNull())
        .select("simhash", "cluster")
    )
    return sigs.join(labeled, "simhash").select(
        F.col(id_col).alias("doc_id"), F.col("cluster").alias("cluster_id")
    )


def duplicate_spans(
    df: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring span dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): find MAXIMAL word
    spans that occur in >= ``min_docs`` distinct documents, as
    per-document ``[span_start, span_end]`` word-offset intervals ready
    for surgical removal.  Unlike ``chunk_documents``-based span dedup
    (fixed non-overlapping 16-word cells — a duplicate straddling a
    cell boundary is invisible), this slides an n-gram at EVERY word
    position, so a shared substring is caught at any alignment, and
    adjacent duplicated positions merge into one maximal span via
    gaps-and-islands (pos - row_number is constant within a run).

    Returns (id_col, span_start, span_end, n_words, n_grams): a span of
    g consecutive duplicated n-grams covers g + n - 1 words.

    100 TB shape: three shuffles, each on a high-cardinality key — the
    n-gram group (map-side combine folds each partition's repeats
    before the exchange), the hit back-join on the same key, and the
    per-doc window.  The group key here is the shingle STRING so the
    DuckDB oracle reproduces it exactly; production would key on
    xxhash64(shingle) to shrink the exchange (collisions only ever ADD
    a candidate position — the span is still a true duplicate region
    at 2^-64 false-mark probability).  The suffix-array formulation of
    the paper is single-node; this is the distributed equivalent."""
    par = df.sparkSession.sparkContext.defaultParallelism
    # token array materialized before the gram transform — slicing the
    # tokenizer EXPRESSION inside the lambda re-runs the regex per
    # position (the round-9 HOF re-evaluation sweep)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("_ws") - n),
        lambda i: F.struct(
            i.cast("long").alias("p"),
            F.array_join(F.slice(F.col("_ws"), i + 1, n), " ").alias("g"),
        ),
    )
    pos = (
        df.repartition(par, F.col(id_col))
        .select(F.col(id_col), words(F.col(text_col)).alias("_ws"))
        .where(F.size("_ws") >= n)
        .select(F.col(id_col), F.explode(grams).alias("x"))
        .select(id_col, F.col("x.p").alias("p"), F.col("x.g").alias("g"))
    )
    dup = (
        pos.groupBy("g")
        .agg(F.countDistinct(id_col).alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("g")
    )
    hits = pos.join(dup, "g").select(id_col, "p")
    w = Window.partitionBy(id_col).orderBy("p")
    isl = hits.withColumn("grp", F.col("p") - F.row_number().over(w))
    return (
        isl.groupBy(id_col, "grp")
        .agg(
            F.min("p").alias("span_start"),
            (F.max("p") + F.lit(n - 1)).alias("span_end"),
            F.count("*").alias("n_grams"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("n_words"),
            "n_grams",
        )
    )
