"""Count-min sketch — the mergeable frequency sketch (Cormode/Muthukrishnan
2005), built entirely from DataFrame aggregates.

Why it exists next to the exact groupBy counts: at 100 TB (or over an
unbounded stream window) per-key exact counts are unbounded state; a CMS
is a FIXED d×w counter grid per partition/window that (a) merges by
cell-wise addition — union + groupBy — so partial sketches roll up like
any other partial aggregate, and (b) answers point frequency queries
with one-sided error: estimate ≥ true count, and ≤ true + ε·N with
probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

Hashing is content-derived (xxhash64 with the row index as seed), so
sketches built anywhere — different partitions, different engines,
different days — merge coherently."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60


def _h60(col: str):
    return hash60(F.col(col).cast("string"), 0)


def cms_build(df: DataFrame, key_col: str, d: int = 4, w: int = 1024) -> DataFrame:
    """Build a (row, col, cnt) counter table — at most d·w rows however
    large ``df`` is.  One explode (d rows per input row, map-side
    combined) + one hash aggregate."""
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(w)).alias("col"),
                )
                for i in range(d)
            ]
        )
    ).alias("cell")
    return (
        df.select(rows)
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum — the property that makes the sketch a partial
    aggregate: per-partition / per-window / per-day sketches roll up
    without touching the raw data again."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(sketch: DataFrame, candidates: DataFrame, key_col: str, d: int = 4, w: int = 1024) -> DataFrame:
    """Point-frequency estimates for a candidate key set: re-derive each
    candidate's d cells, join the counter table on (row, col) —
    equality join, broadcast when the sketch is collected small — and
    take the min.  Missing cells count 0 (key never seen)."""
    cells = candidates.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(w)).alias("col"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("cell"),
    ).select(key_col, F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
    joined = cells.join(F.broadcast(sketch), ["row", "col"], "left").select(
        key_col, F.coalesce(F.col("cnt"), F.lit(0)).alias("cell_cnt")
    )
    return joined.groupBy(key_col).agg(F.min("cell_cnt").alias("est"))


def cms_join_size(a: DataFrame, b: DataFrame) -> DataFrame:
    """Equi-join cardinality estimate from two CMS counter tables built
    on the join key with the SAME (d, w): |A ⋈ B| ≈ min over rows of the
    per-row inner product Σ_col cnt_a·cnt_b (Cormode/Muthukrishnan §4.2).
    Pass the same sketch twice for the self-join size Σ_k n_k² — the
    number the planner needs to see a skew blowup coming.

    One-sided like the point estimate: every true (key_a, key_b) match
    lands in the same cell in every row, so each row's inner product
    counts all true pairs plus non-negative collision cross-terms —
    estimate ≥ truth always, and the min over d rows keeps the best row.

    100 TB shape: the inputs are sketches (≤ d·w rows each however large
    the joined tables are), so this is an equality join + two bounded
    aggregates over counter rows — join planning without touching the
    data, mergeable across days/partitions via :func:`cms_merge`.
    Output: one row, ``est_pairs`` BIGINT (0 for empty inputs)."""
    prods = (
        a.join(b.withColumnRenamed("cnt", "cnt_b"), ["row", "col"])
        .groupBy("row")
        .agg(F.sum(F.col("cnt") * F.col("cnt_b")).alias("ip"))
    )
    return prods.agg(
        F.coalesce(F.min("ip"), F.lit(0)).cast("bigint").alias("est_pairs")
    )


def heavy_hitters(
    df: DataFrame, key_col: str, min_count: int, d: int = 4, w: int = 4096
) -> DataFrame:
    """Keys appearing at least ``min_count`` times — sketch-then-verify.

    Candidate keys are those whose CMS ESTIMATE clears the bar;
    one-sided error makes this a guaranteed superset (no false
    negatives, ever), and the exact verification pass (semi join + one
    aggregate over candidate rows) keeps truth only — collisions cost
    verify work, never correctness (pinned in tests with a deliberately
    collision-saturated sketch).

    Honest scale framing: in THIS batch form the candidate enumeration
    scans the same data an exact GROUP BY ... HAVING would, so the win
    is not the batch pass — it is that the SKETCH, not the data, is
    what you keep.  Combined with the streaming partial-sketch log
    (streaming/sketch.py), frequency queries over any later candidate
    set ("which of today's keys were heavy over the whole month") read
    d·w·n_batches counter rows instead of re-scanning history; the
    registry query uses the batch identity to hash-verify the
    build→estimate→verify arithmetic end-to-end."""
    sketch = cms_build(df, key_col, d=d, w=w)
    distinct_keys = df.select(key_col).distinct()
    cands = (
        cms_estimate(sketch, distinct_keys, key_col, d=d, w=w)
        .where(F.col("est") >= min_count)
        .select(key_col)
    )
    return (
        df.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count profiles (Apache DataSketches HLL, built into
# Spark: hll_sketch_agg / hll_union / hll_sketch_estimate).
#
# Why next to exact COUNT(DISTINCT): at 100 TB an exact distinct is a
# full shuffle of every distinct key per group; the HLL profile is a
# FIXED ~2^lgk-byte register bank per group that (a) aggregates with
# map-side partials like any other agg (no distinct shuffle), and
# (b) MERGES by register-max — so per-day / per-shard / per-source
# profiles roll up without re-reading the data, the same persisted-log
# pattern the CMS uses for frequencies.  Standard error ≈ 1.04/√2^lgk
# (~1.6% at the lgk=12 default).
# ---------------------------------------------------------------------------
def hll_profile(df: DataFrame, keys: list[str], col: str, lgk: int = 12) -> DataFrame:
    """Per-group HLL sketch + estimate.  Keeps the ``sketch`` binary so
    the caller can persist it and union later batches in without the
    original rows (see hll_merge_profiles)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(col, F.lit(lgk)).alias("sketch")
    ).select(
        *keys,
        F.hll_sketch_estimate("sketch").alias("n_distinct_est"),
        "sketch",
    )


def hll_merge_profiles(*profiles: DataFrame, keys: list[str]) -> DataFrame:
    """Union per-batch profiles into one: register-wise max via
    hll_union_agg — commutative, associative, and idempotent, so the
    merge is order-independent and overlapping batches never double
    count (both pinned exactly in tests), and a persisted profile table
    updates incrementally: read yesterday's sketches, union today's,
    write back.  No raw-data re-scan, ever.

    Estimator subtlety (tested, worth knowing): DataSketches HLL keeps a
    higher-accuracy HIP estimator only for a sketch that saw its stream
    directly; union falls back to the register-based estimate, so a
    merged profile's estimate can differ by ~1σ from a single-pass
    sketch over the concatenated data.  Both stay within the
    1.04/√2^lgk bound; only the REGISTER state — not the estimate — is
    what merges losslessly."""
    out = profiles[0].select(*keys, "sketch")
    for p in profiles[1:]:
        out = out.unionByName(p.select(*keys, "sketch"))
    return out.groupBy(*keys).agg(
        F.hll_union_agg("sketch").alias("sketch")
    ).select(
        *keys,
        F.hll_sketch_estimate("sketch").alias("n_distinct_est"),
        "sketch",
    )


# ---------------------------------------------------------------------------
# KMV (bottom-k / k-minimum-values) sketches: distinct counts AND set
# operations (Jaccard, intersection size) from the k smallest hashes of
# each group's item set.  The niche next to HLL: KMV supports set
# ALGEBRA (union = bottom-k of the union; the same hash for the same
# item lets sketches intersect), and — built on the engine-portable
# hash60 — it is fully DETERMINISTIC, so unlike HLL these estimates are
# graded against exact DuckDB oracles, not just error bounds.
#
# 100 TB shape: one distinct-shuffle of (group, hash) — the same cost
# as any per-group distinct — then a per-group window keeps k rows; all
# later algebra (merge, estimate, pairwise Jaccard) runs on k-row
# sketches, data-size-independent.  Standard error ≈ 1/√(k-2).
# ---------------------------------------------------------------------------
def kmv_profile(df: DataFrame, keys: list[str], col: str, k: int = 256) -> DataFrame:
    """Per-group bottom-k sketch: (keys..., h) — the k smallest hash60
    values over the group's DISTINCT items (fewer rows than k ⇒ the
    group's full distinct set, and estimates below are exact)."""
    h = _h60(col)
    dist = df.select(*keys, h.alias("h")).distinct()
    w = Window.partitionBy(*keys).orderBy("h")
    return dist.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= k
    ).drop("_rn")


def kmv_merge(*sketches: DataFrame, keys: list[str], k: int = 256) -> DataFrame:
    """Union sketches: bottom-k of the merged hash sets per group —
    associative and idempotent (set union), so per-shard / per-day
    sketches roll up losslessly like the HLL/Bloom logs."""
    out = sketches[0].select(*keys, "h")
    for s in sketches[1:]:
        out = out.unionByName(s.select(*keys, "h"))
    dist = out.distinct()
    w = Window.partitionBy(*keys).orderBy("h")
    return dist.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= k
    ).drop("_rn")


def kmv_estimate(sketch: DataFrame, keys: list[str], k: int = 256) -> DataFrame:
    """(keys..., n_distinct_est DOUBLE): exact count when the group held
    fewer than k distinct items, else (k-1)·2^60 / h_(k) — every input
    an exact integer, every op a correctly-rounded double, so the
    estimate hash-matches the SQL twin bit-for-bit."""
    agg = sketch.groupBy(*keys).agg(
        F.count("*").alias("_c"), F.max("h").alias("_hk")
    )
    est = F.when(F.col("_c") < k, F.col("_c").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(1152921504606846976.0) / F.col("_hk")
    )
    return agg.select(*keys, est.alias("n_distinct_est"))


def _kmv_pair_flags(sketch: DataFrame, group_col: str, k: int) -> DataFrame:
    """Shared pair machinery for the pairwise KMV estimators: for every
    group pair (ga < gb), the bottom-k of the two sketches' hash UNION,
    each hash flagged with membership (_ina/_inb as 1-or-NULL).  The
    union of two bottom-k sketches' k smallest values is itself the
    union's KMV sketch — that closure is what makes every pairwise
    estimate below computable from sketches alone."""
    m = sketch.select(F.col(group_col).alias("g"), "h").localCheckpoint(eager=False)
    groups = m.select("g").distinct()
    pairs = (
        groups.select(F.col("g").alias("ga"))
        .crossJoin(F.broadcast(groups.select(F.col("g").alias("gb"))))
        .where(F.col("ga") < F.col("gb"))
    )
    ha = m.select(F.col("g").alias("ga"), F.col("h"))
    hb = m.select(F.col("g").alias("gb"), F.col("h"))
    uni = (
        pairs.join(ha, "ga").select("ga", "gb", "h")
        .unionByName(pairs.join(hb, "gb").select("ga", "gb", "h"))
        .distinct()
    )
    w = Window.partitionBy("ga", "gb").orderBy("h")
    topk = uni.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return (
        topk.join(
            ha.withColumn("_ina", F.lit(1)), ["ga", "h"], "left"
        ).join(hb.withColumn("_inb", F.lit(1)), ["gb", "h"], "left")
    )


def _kmv_both():
    # left-join misses are NULL: isNotNull, not == 1 (NULL & TRUE is
    # NULL, and a disjoint pair would aggregate to NULL instead of 0).
    # A function, not a module constant — Column construction needs an
    # active session.
    return (F.col("_ina").isNotNull() & F.col("_inb").isNotNull()).cast("int")


def kmv_jaccard(sketch: DataFrame, group_col: str, k: int = 256) -> DataFrame:
    """Pairwise Jaccard estimates between every two groups of one
    sketch table: U = bottom-k of the two sketches' hash union,
    J = |{h ∈ U : h in BOTH sketches}| / |U|  (group_a < group_b).

    Scale shape: the |groups| list broadcasts into a pair frame; each
    pair processes ≤ 2k sketch rows — |groups|²·k work total,
    independent of the data the sketches summarize."""
    flagged = _kmv_pair_flags(sketch, group_col, k)
    return flagged.groupBy("ga", "gb").agg(
        (F.sum(_kmv_both()).cast("double") / F.count("*")).alias("jaccard_est")
    ).select(
        F.col("ga").alias("group_a"), F.col("gb").alias("group_b"), "jaccard_est"
    )


def kmv_set_sizes(sketch: DataFrame, group_col: str, k: int = 256) -> DataFrame:
    """Pairwise set-algebra cardinalities from the SAME KMV sketches:
    (group_a, group_b, jaccard_est, union_est, inter_est) — the sketch
    answers |A ∪ B| and |A ∩ B| for every pair without touching the
    data again (the planner/profiler use: overlap sizing between
    sources, shards, or time slices).

    Math: the bottom-k of the two sketches' hash-union is the union's
    own KMV sketch, so |A ∪ B| uses the standard (k−1)·2⁶⁰ / h_(k)
    estimator (exact when the union holds < k hashes), and
    |A ∩ B| = J · |A ∪ B| by inclusion–exclusion on the Jaccard.
    Determinism: every term is an exact integer or a correctly-rounded
    double of exact integers — the estimate hash-matches the SQL twin
    bit-for-bit, like kmv_estimate."""
    flagged = _kmv_pair_flags(sketch, group_col, k)
    agg = flagged.groupBy("ga", "gb").agg(
        (F.sum(_kmv_both()).cast("double") / F.count("*")).alias("jaccard_est"),
        F.count("*").alias("_c"),
        F.max("h").alias("_hk"),
    )
    union_est = F.when(F.col("_c") < k, F.col("_c").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(1152921504606846976.0) / F.col("_hk")
    )
    return agg.select(
        F.col("ga").alias("group_a"),
        F.col("gb").alias("group_b"),
        "jaccard_est",
        union_est.alias("union_est"),
        (F.col("jaccard_est") * union_est).alias("inter_est"),
    )


def cdf_histogram(
    df: DataFrame, keys: list[str], value_col: str, cuts: list[float]
) -> DataFrame:
    """Batch twin of the streaming :func:`~..streaming.sketch.cdf_codec`
    build: per-key fixed-cut bucket counts (bucket = #cuts ≤ value, NULL
    values dropped).  Counts are exact, so merge (cell-wise sum) is
    build-path-independent — the stream log pins bit-identical to this.
    One scan, map-side combine, ≤ |key-domain|·(len(cuts)+1) rows."""
    bucket = sum(
        (F.when(F.lit(c) <= F.col(value_col), 1).otherwise(0) for c in cuts),
        F.lit(0),
    ).cast("int")
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*keys, bucket.alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cdf_quantiles(
    hist: DataFrame, keys: list[str], cuts: list[float], qs: list[float]
) -> DataFrame:
    """Quantile BRACKETS from fixed-cut bucket counts: for each key and
    q ∈ (0, 1], the bucket holding the ceil(q·n)-th value, reported as
    (keys…, q, bucket, lo, hi, n) with lo/hi the bucket's cut bounds
    (NULL for the open ends).  The true q-quantile lies in [lo, hi] —
    exact integer-count arithmetic, deterministic on any engine; the
    resolution (not the count) is where a fixed-cut sketch pays
    vs the equi-depth batch profile.

    Shape: one cumulative window over ≤ |keys|·(len(cuts)+1) counter
    rows, a |qs|-explode, one min-aggregate — sketch-sized work however
    large the stream that built the histogram was."""
    w_cum = Window.partitionBy(*keys).orderBy("bucket")
    w_all = Window.partitionBy(*keys)
    cum = hist.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(w_all)
    )
    qdf = cum.withColumn(
        "q", F.explode(F.array(*[F.lit(float(q)) for q in qs]))
    )
    # ceil(q·n) in exact arithmetic: the smallest rank the quantile covers
    target = F.ceil(F.col("q") * F.col("n").cast("double")).cast("bigint")
    picked = (
        qdf.where(F.col("cum") >= target)
        .groupBy(*keys, "q", "n")
        .agg(F.min("bucket").alias("bucket"))
    )
    bounds = F.array(*[F.lit(float(c)) for c in cuts])
    return picked.select(
        *keys,
        "q",
        "bucket",
        F.when(F.col("bucket") > 0, F.element_at(bounds, F.col("bucket"))).alias("lo"),
        F.when(
            F.col("bucket") < len(cuts), F.element_at(bounds, F.col("bucket") + 1)
        ).alias("hi"),
        "n",
    )


def rolling_distinct(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    window_hours: int = 3,
    lgk: int = 12,
) -> DataFrame:
    """Trailing-window distinct counts from MERGEABLE sketches: per
    (keys…, hour) an HLL register bank, then the rolling estimate via
    ``hll_union_agg`` over a RANGE frame of the preceding
    ``window_hours`` — (keys…, hour, n_hour_exact, n_rolling_est).

    Why not exact: a sliding COUNT(DISTINCT) re-deduplicates the whole
    trailing window at every slide — at 100 TB that is window_hours×
    the distinct shuffle, every hour, forever.  Register banks union in
    O(2^lgk) per step regardless of cardinality, the same
    persisted-log property the CMS/Bloom/KMV logs use; the hourly
    sketch table is all that is ever kept.  The frame is RANGE over
    epoch seconds, not ROWS — an hour with no events must still age
    out of the window (a ROWS frame would silently stretch the window
    across gaps).  Per-hour exact counts ride along for free (the
    groupBy already shuffles on (keys, hour)) as the in-window accuracy
    reference."""
    hour = F.date_trunc("hour", F.col(ts_col))
    hourly = (
        df.groupBy(*keys, hour.alias("hour"))
        .agg(
            F.expr(f"hll_sketch_agg({value_col}, {lgk})").alias("sketch"),
            F.countDistinct(value_col).alias("n_hour_exact"),
        )
        .withColumn("_sec", F.unix_timestamp("hour"))
    )
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy("_sec")
        .rangeBetween(-(window_hours - 1) * 3600, 0)
    )
    return hourly.select(
        *keys,
        "hour",
        "n_hour_exact",
        F.hll_sketch_estimate(F.expr("hll_union_agg(sketch)").over(w)).alias(
            "n_rolling_est"
        ),
    )
