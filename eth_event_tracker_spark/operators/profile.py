"""Single-pass table profiling — the SUMMARIZE-style utility an
analytics engine owes its users: per-column non-null count, distinct
count, and min/max, computed in ONE scan of the table.

Output schema (one row per profiled column):
    column     string   column name
    n_nonnull  long
    n_distinct long     exact or approximate (see ``approx``)
    min_num / max_num   double  numeric columns (else null)
    min_str / max_str   string  string/binary/temporal/bool (else null)

100 TB shape: a single aggregate with map-side partial aggregation —
the scan is the cost; no joins, no windows.  Distinct counts default to
``approx_count_distinct`` (HLL, constant memory per column); exact
count-distinct over many columns goes through Spark's Expand (one scan,
rows × #columns into the partial agg) — fine for the oracle-checked
fixture query, deliberate opt-in at scale.  Complex-typed columns
(array/map/struct) get counts only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)
_STRINGY = (T.StringType, T.BinaryType, T.BooleanType, T.DateType, T.TimestampType)


def table_profile(df: DataFrame, columns: list[str] | None = None, approx: bool = True) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` in one scan."""
    fields = [f for f in df.schema.fields if columns is None or f.name in columns]
    aggs = []
    for f in fields:
        c = F.col(f.name)
        nd = F.approx_count_distinct(c) if approx else F.count_distinct(c)
        aggs.append(F.count(c).alias(f"{f.name}__nn"))
        aggs.append(nd.cast("long").alias(f"{f.name}__dc"))
        if isinstance(f.dataType, _NUMERIC):
            aggs.append(F.min(c).cast("double").alias(f"{f.name}__mnn"))
            aggs.append(F.max(c).cast("double").alias(f"{f.name}__mxn"))
        elif isinstance(f.dataType, _STRINGY):
            aggs.append(F.min(c).cast("string").alias(f"{f.name}__mns"))
            aggs.append(F.max(c).cast("string").alias(f"{f.name}__mxs"))
    wide = df.agg(*aggs)
    rows = []
    for f in fields:
        num = isinstance(f.dataType, _NUMERIC)
        stry = isinstance(f.dataType, _STRINGY)
        rows.append(
            F.struct(
                F.lit(f.name).alias("column"),
                F.col(f"{f.name}__nn").alias("n_nonnull"),
                F.col(f"{f.name}__dc").alias("n_distinct"),
                (F.col(f"{f.name}__mnn") if num else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"{f.name}__mxn") if num else F.lit(None).cast("double")).alias("max_num"),
                (F.col(f"{f.name}__mns") if stry else F.lit(None).cast("string")).alias("min_str"),
                (F.col(f"{f.name}__mxs") if stry else F.lit(None).cast("string")).alias("max_str"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def source_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Pairwise content-overlap matrix between corpus groups (sources,
    crawls, snapshots): for every group pair, how many distinct word
    ``shingle_n``-gram shingles they share, each group's distinct-shingle
    total, and the containment ratio ``n_shared / min(n_a, n_b)`` — the
    cross-source contamination report a curator reads before deciding
    which sources need cross-deduplication (whole-document overlap misses
    near-copies; shingle overlap is what MinHash ultimately measures).

    Output: (source_a, source_b, n_shared, n_a, n_b, containment),
    source_a < source_b.  A NULL group cannot be ordered against the
    others and is deliberately absent from the pair matrix (drift for a
    NULL group is still reported by psi_drift, which is null-safe).

    Scale shape (100 TB): shingles are row-local (text.word_shingles),
    reduced to DISTINCT (group, shingle-hash) with map-side combine —
    one row per distinct pair, never the token stream.  The pair match
    is a self-equi-join on the shingle hash: per-hash group sets are
    bounded by the group count (tens), so the join output is
    O(distinct shingles × pairs-sharing), no all-pairs blowup; totals
    are a |groups|-row broadcast."""
    from .text import word_shingles
    from ..functions.hashing import hash60

    sh = word_shingles(df, text_col=text_col, n=shingle_n, id_col=id_col)
    # three consumers (totals + both self-join sides): cut lineage so the
    # shingle explode + distinct run once
    gh = (
        sh.join(df.select(id_col, group_col), id_col)
        .select(F.col(group_col).alias("g"), hash60(F.col("shingle"), 1).alias("h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    totals = gh.groupBy("g").agg(F.count("*").alias("n"))
    a = gh.select(F.col("g").alias("source_a"), "h")
    bt = gh.select(F.col("g").alias("source_b"), "h")
    pairs = (
        a.join(bt, "h")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared"))
    )
    ta = totals.select(F.col("g").alias("source_a"), F.col("n").alias("n_a"))
    tb = totals.select(F.col("g").alias("source_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            (F.col("n_shared").cast("double") / F.least("n_a", "n_b")).alias("containment"),
        )
    )


def psi_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    cuts: list[float],
) -> DataFrame:
    """Population Stability Index of each group's ``value_col``
    distribution against the whole corpus, over fixed bucket ``cuts`` —
    the standard drift monitor a continuously-ingesting pipeline runs
    per source / per snapshot (PSI < 0.1 stable, 0.1-0.25 drifting,
    > 0.25 shifted).  Output: (group_col, psi).

    ``bucket = #cuts <= value`` (row-local fold, the z-order convention);
    counts are Laplace-smoothed (+1 per bucket) so empty buckets
    contribute finitely; every (group, bucket) combo is materialized via
    a |groups| × |buckets| generated frame so a bucket a group never
    hits still counts against it.

    Scale shape: ONE scan → (group, bucket) counts with map-side
    combine; everything after operates on |groups| × |buckets| rows.
    Determinism: ln() sees ratios of exact integers (deterministic IEEE
    division), per-bucket contributions round to 1e-9-unit integers and
    sum exactly (the tf_idf/unigram convention) — hash-green vs the SQL
    twin."""
    n_buckets = len(cuts) + 1
    v = F.col(value_col)
    bucket = sum(
        (F.when(F.lit(c) <= v, 1).otherwise(0) for c in cuts), F.lit(0)
    ).alias("bucket")

    # |groups|×|buckets| rows after ONE scan; three consumers (overall,
    # the group list, the fill join) — cut lineage so the scan runs once
    counts = (
        df.select(F.col(group_col).alias("g"), bucket)
        .groupBy("g", "bucket")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    overall = counts.groupBy("bucket").agg(F.sum("c").alias("d"))
    groups = counts.select("g").distinct()
    grid = groups.crossJoin(
        df.sparkSession.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    )
    # NULL-safe group joins throughout (same rationale as the
    # temperature samplers): a NULL group must drift-check like any
    # other, not silently lose its counts to NULL != NULL
    cts = counts.select(
        F.col("g").alias("_cg"), F.col("bucket").alias("_cb"), "c"
    )
    full = (
        grid.join(
            cts,
            grid["g"].eqNullSafe(F.col("_cg")) & (grid["bucket"] == F.col("_cb")),
            "left",
        )
        .select(grid["g"], grid["bucket"], F.coalesce("c", F.lit(0)).alias("c"))
        .join(F.broadcast(overall), "bucket", "left")
        .select("g", "bucket", "c", F.coalesce("d", F.lit(0)).alias("d"))
    )
    ng = full.groupBy("g").agg(F.sum("c").alias("n_g"))
    nt = full.select(F.col("bucket"), F.col("d")).distinct().agg(F.sum("d").alias("n_t"))
    B = F.lit(float(n_buckets))
    p = (F.col("c") + 1.0) / (F.col("n_g") + B)
    q = (F.col("d") + 1.0) / (F.col("n_t") + B)
    contrib = F.round((p - q) * F.log(p / q) * 1e9).cast("long")
    return (
        full.join(
            F.broadcast(ng.select(F.col("g").alias("_ng_g"), "n_g")),
            full["g"].eqNullSafe(F.col("_ng_g")),
        )
        .crossJoin(F.broadcast(nt))
        .select(full["g"], contrib.alias("c_e9"))
        .groupBy("g")
        .agg((F.sum("c_e9").cast("double") / 1e9).alias("psi"))
        .withColumnRenamed("g", group_col)
    )


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation over ``cols`` in ONE scan: output
    (col_x, col_y, n, corr) for every unordered pair — the numeric
    co-movement profile (feature redundancy screening, quality-signal
    collinearity) beside :func:`table_profile`'s per-column stats.

    Determinism convention (the repo-wide SUM rule, queries/__init__):
    the five moments per pair (Σx, Σy, Σxy, Σx², Σy²) are summed as
    DECIMAL(18,4) values/products — EXACT, order-independent — then the
    corr formula runs in double from those identical inputs on any
    engine, rounds to a 1e-9-unit BIGINT, and grades against the same
    SQL.  Rows with a NULL in either column drop from that pair only
    (the FILTER semantics); a zero-variance side yields corr NULL (the
    guard compares the same doubles on both engines, so the NULL is
    engine-portable too).

    100 TB shape: a single aggregate — one scan, map-side partial
    aggregation, |pairs|·6 accumulators, a 1-row result exploded to
    |pairs| rows.  No shuffle beyond the final 1-row combine, no joins,
    nothing driver-side."""
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]

    def dec(c: str):
        return F.col(c).cast("decimal(18,4)")

    aggs = []
    for a, b in pairs:
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        p = f"{a}__{b}"
        aggs += [
            F.count(F.when(both, F.lit(1))).alias(f"n__{p}"),
            F.sum(F.when(both, dec(a))).cast("double").alias(f"sx__{p}"),
            F.sum(F.when(both, dec(b))).cast("double").alias(f"sy__{p}"),
            F.sum(F.when(both, dec(a) * dec(b))).cast("double").alias(f"sxy__{p}"),
            F.sum(F.when(both, dec(a) * dec(a))).cast("double").alias(f"sxx__{p}"),
            F.sum(F.when(both, dec(b) * dec(b))).cast("double").alias(f"syy__{p}"),
        ]
    row = df.agg(*aggs)
    structs = []
    for a, b in pairs:
        p = f"{a}__{b}"
        n = F.col(f"n__{p}").cast("double")
        sx, sy, sxy, sxx, syy = (
            F.col(f"{k}__{p}") for k in ("sx", "sy", "sxy", "sxx", "syy")
        )
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        corr = F.when(
            (vx > 0) & (vy > 0),
            F.round((n * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy)) * F.lit(1e9))
            .cast("long")
            .cast("double")
            / F.lit(1e9),
        )
        structs.append(
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.col(f"n__{p}").alias("n"),
                corr.alias("corr"),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def equidepth_histogram(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    n_buckets: int = 8,
) -> DataFrame:
    """Per-group equi-DEPTH histogram of ``value_col``: ``n_buckets``
    buckets of (near-)equal row count, each reported as
    (group, bucket, lo, hi, n).  The data-driven complement of
    :func:`psi_drift`'s fixed cuts — this is the profile that adapts its
    bucket boundaries to each group's own distribution (optimizer-style
    equi-depth statistics, skew diagnosis, per-source length P12.5/…
    quantile bands in one shot).

    Bucket assignment is ANSI ``NTILE(n)`` over a TOTAL order
    (``value_col`` asc NULLS FIRST, then ``id_col``) — the explicit
    null placement and id tie-break make the assignment deterministic
    and engine-portable (DuckDB defaults to NULLS LAST on ASC, Spark to
    NULLS FIRST; the oracle says NULLS FIRST on both).  NTILE gives the
    first ``n_total mod n_buckets`` buckets one extra row — exact
    equal-depth up to the unavoidable ±1.

    100 TB shape: one hash shuffle on ``group_col``, one per-group sort
    window (Spark's ExternalSorter spills — group size bounds the sort,
    not memory), then a (group, bucket) aggregate with map-side
    combine.  No driver data, no cross join; output is
    |groups| × n_buckets rows."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc_nulls_first(), F.col(id_col).asc_nulls_first()
    )
    return (
        df.select(group_col, value_col, id_col)
        .withColumn("bucket", F.ntile(n_buckets).over(w))
        .groupBy(group_col, "bucket")
        .agg(
            F.min(value_col).alias("lo"),
            F.max(value_col).alias("hi"),
            F.count("*").alias("n"),
        )
    )


def ols_trend(
    df: DataFrame,
    group_col: str,
    x_col,
    y_col: str,
) -> DataFrame:
    """Per-group simple OLS fit of ``y_col`` over ``x_col`` — the trend
    profile (is each source's quality/length/value drifting, and how
    fast) beside the point-in-time monitors (psi_drift's distribution
    shift, corr_matrix's co-movement).  Output:
    (group_col, n, slope, intercept) with slope in y-units per x-unit.

    Same exactness recipe as corr_matrix: the five moments per group
    (Σx, Σy, Σxy, Σx², n) are summed as DECIMAL(18,4) values/products —
    exact and order-independent — then slope/intercept run in double
    from those identical inputs and round to 1e-9 units, so the result
    hash-matches any engine computing the same formula.  Caller
    responsibility: pass an x already shifted to a small origin (e.g.
    seconds since the corpus epoch, not raw Unix time) — the moments
    stay exact either way, but a well-conditioned x keeps the double
    formula's cancellation benign on BOTH engines equally.  Rows with a
    NULL in either column drop from that group's fit; a zero-variance x
    yields NULL slope/intercept (vertical line — undefined).

    100 TB shape: ONE aggregate with map-side partials — no joins, no
    window, |groups| rows out."""
    x = x_col if not isinstance(x_col, str) else F.col(x_col)
    y = F.col(y_col)
    both = x.isNotNull() & y.isNotNull()
    dx = x.cast("decimal(18,4)")
    dy = y.cast("decimal(18,4)")
    g = df.groupBy(group_col).agg(
        F.count(F.when(both, F.lit(1))).alias("n"),
        F.sum(F.when(both, dx)).cast("double").alias("sx"),
        F.sum(F.when(both, dy)).cast("double").alias("sy"),
        F.sum(F.when(both, dx * dy)).cast("double").alias("sxy"),
        F.sum(F.when(both, dx * dx)).cast("double").alias("sxx"),
    )
    n = F.col("n").cast("double")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / vx
    intercept = (F.col("sy") - slope * F.col("sx")) / n

    def _r9(c):
        return F.round(c * F.lit(1e9)).cast("long").cast("double") / F.lit(1e9)

    return g.select(
        group_col,
        "n",
        F.when(vx > 0, _r9(slope)).alias("slope"),
        F.when(vx > 0, _r9(intercept)).alias("intercept"),
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 3,
    scale: int = 10000,
    approx: bool = False,
) -> DataFrame:
    """Per-group robust outlier flags via the median / MAD rule: a row is
    an outlier when ``|x - median| > k * MAD`` where MAD is the median of
    the absolute deviations — the robust alternative to mean/stddev
    z-scores (a single wild value shifts the mean AND inflates sigma,
    masking itself; the median and MAD have a 50% breakdown point).

    Engine-portable exactness: values are quantized to BIGINT units via
    the repo's DECIMAL(18,4) convention (``xq = value * scale``), so both
    medians interpolate over integers — the results are half-/quarter-
    integers, exactly representable in double, and every comparison is
    exact on both engines.  MAD == 0 (over half the group identical)
    flags EVERY deviating row — the textbook rule's behavior, documented
    here rather than papered over.

    Returns the input columns plus ``xq`` (quantized value), ``med`` and
    ``mad`` (in quantized units, double), and ``is_outlier`` (boolean;
    NULL for NULL values — they have no deviation).

    100 TB shape: ONE shuffle — both medians are unbounded-frame window
    aggregates over the same ``partitionBy(group)`` exchange (two Window
    nodes, one Exchange).  Exact percentile buffers each group's values;
    at extreme group sizes pass ``approx=True`` for the
    ``approx_percentile`` sketch tier (mergeable, constant memory —
    flags may differ within sketch error near the threshold)."""
    xq = (F.col(value_col).cast("decimal(18,4)") * scale).cast("long")
    w = Window.partitionBy(group_col)
    pctl = "approx_percentile" if approx else "percentile"
    step1 = df.withColumn("xq", xq).withColumn(
        "med", F.expr(f"{pctl}(xq, 0.5)").over(w).cast("double")
    )
    dev = F.abs(F.col("xq").cast("double") - F.col("med"))
    step2 = step1.withColumn("dev", dev).withColumn(
        "mad", F.expr(f"{pctl}(dev, 0.5)").over(w).cast("double")
    )
    return step2.withColumn("is_outlier", F.col("dev") > F.lit(k) * F.col("mad"))


def winsorize_tukey(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 1.5,
    scale: int = 10000,
    approx: bool = False,
) -> DataFrame:
    """Per-group Tukey-fence winsorization: values are clipped to
    ``[Q1 - k*IQR, Q3 + k*IQR]`` — the boxplot rule, the standard
    robust clip a feature pipeline applies before aggregation so a few
    wild rows cannot dominate a sum/mean (the flag-only complement is
    ``mad_outliers``; this one REPAIRS instead of reporting).

    Engine-exact by construction: values quantize to BIGINT units
    (DECIMAL(18,4) ``* scale``), and the quartile positions
    ``(n-1)*0.25`` / ``(n-1)*0.75`` are dyadic — every interpolated
    quartile, fence (k=1.5 is exact binary), and clipped value is a
    quarter-integer, exactly representable in double whichever
    algebraically-equivalent interpolation formula an engine uses.
    Arbitrary p-quantile clipping would NOT have this property (0.01 is
    not binary-exact, so engines can disagree in the last ulp).

    Returns input columns plus ``xq``, ``lo_fence``/``hi_fence``
    (quantized units) and ``clipped`` (quantized, winsorized).  NULL
    values stay NULL and never clip.

    100 TB shape: ONE shuffle — both quartiles ride a single
    ``partitionBy(group)`` window exchange, clipping is a projection.
    ``approx=True`` swaps in mergeable ``approx_percentile`` when exact
    per-group buffering is too large."""
    xq = (F.col(value_col).cast("decimal(18,4)") * scale).cast("long")
    w = Window.partitionBy(group_col)
    pctl = "approx_percentile" if approx else "percentile"
    q = (
        df.withColumn("xq", xq)
        .withColumn("q1", F.expr(f"{pctl}(xq, 0.25)").over(w).cast("double"))
        .withColumn("q3", F.expr(f"{pctl}(xq, 0.75)").over(w).cast("double"))
    )
    iqr = F.col("q3") - F.col("q1")
    lo = (F.col("q1") - F.lit(k) * iqr).alias("lo_fence")
    hi = (F.col("q3") + F.lit(k) * iqr).alias("hi_fence")
    out = q.withColumn("lo_fence", lo).withColumn("hi_fence", hi)
    # explicit NULL guard: least/greatest IGNORE nulls (a NULL value
    # would silently clip to the low fence instead of staying NULL)
    clipped = F.when(
        F.col("xq").isNull(), F.lit(None).cast("double")
    ).otherwise(
        F.least(F.greatest(F.col("xq").cast("double"), F.col("lo_fence")), F.col("hi_fence"))
    )
    return out.withColumn("clipped", clipped).drop("q1", "q3")


def zipf_profile(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_r: int = 100,
) -> DataFrame:
    """Per-group Zipf fit: OLS slope of ln(term frequency) over
    ln(rank) across each group's ``top_r`` most frequent terms —
    (group, n, slope, intercept).  Natural language sits near slope −1
    (Zipf's law); a source whose slope is far off is machine-generated,
    template-expanded, or vocabulary-collapsed — the corpus-forensics
    signal beside psi_drift (distribution SHIFT) and lang_id (which
    language): this one asks "is it language at all".

    Determinism: rank comes from a total order (freq DESC, term ASC);
    x = round(ln(rank)·1e4)/1e4 and y = round(ln(freq)·1e4)/1e4 — ln()
    of exact integers agrees across engines to ≤1 ulp and the 1e-4
    quantization absorbs it; the quantized values are exactly the
    DECIMAL(18,4) grid :func:`ols_trend` casts to, and in NATURAL ln
    units every decimal moment stays < 2^53 in raw units, so the
    decimal→double conversions are correctly rounded on both engines
    (1e-9-unit inputs would push Σxy to ~1e21 where DuckDB's two-step
    decimal→double cast drifts a ulp, and an intercept of ~5e9 is too
    large for the final 1e-9 rounding to absorb it — measured, not
    theoretical).  Slope is unitless (ln-units cancel): the Zipf
    exponent directly.

    100 TB shape: the fit consumes the per-(group, term) COUNT table —
    never the token stream; one window ranks within each group; the
    moments aggregate ≤ top_r rows per group with map-side partials."""
    toks = (
        df.select(F.col(group_col), F.explode(F.split(
            F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
        )).alias("term"))
        .where(F.col("term") != "")
    )
    tf = toks.groupBy(group_col, "term").agg(F.count("*").alias("n"))
    w = Window.partitionBy(group_col).orderBy(F.desc("n"), "term")
    rk = tf.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= top_r)
    pts = rk.select(
        group_col,
        (F.round(F.log(F.col("rank").cast("double")) * 1e4).cast("long") / F.lit(1e4)).alias("x"),
        (F.round(F.log(F.col("n").cast("double")) * 1e4).cast("long") / F.lit(1e4)).alias("y"),
    )
    return ols_trend(pts, group_col, "x", "y")


def concentration_profile(df: DataFrame, group_col: str, weight_col: str | None = None) -> DataFrame:
    """Corpus concentration over a categorical dimension: per-group mass
    plus the three standard inequality scalars — Shannon entropy (nats),
    Herfindahl–Hirschman index, and the Gini coefficient.  The
    source-mix report a training-data pipeline reads before setting
    mixture weights: a near-1 HHI / near-0 entropy corpus is one domain
    wearing many names.

    Output: one row per group — (group, mass, share, cum_share) with the
    corpus scalars (entropy, hhi, gini) repeated on every row (they are
    1-row broadcast constants; repeating keeps the result a single flat
    table).  ``cum_share`` runs over groups ordered by (mass desc, group)
    — the "top-k sources hold X%" curve.

    Scale shape (100 TB): the corpus collapses to |groups| rows at the
    first map-side-combined aggregate; every window/self-aggregate after
    runs on that tiny table.  Determinism: masses are exact BIGINTs;
    HHI = Σ m_i² / M² and Gini = Σ (2·rank_asc − G − 1)·m_i / (G·M) are
    integer-exact numerators with one final double division; entropy
    terms −(m/M)·ln(m/M) quantize to 1e-9 BIGINT units before the sum
    (the bm25/pmi convention), so Σ is order-independent; shares round
    to 1e-9.
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    g = df.groupBy(F.col(group_col).alias("grp")).agg(F.sum(w).cast("long").alias("mass"))
    tot = g.agg(
        F.sum("mass").alias("m_tot"),
        F.count("*").alias("n_grps"),
        F.sum(F.col("mass") * F.col("mass")).alias("sq_sum"),
    )
    wcum = Window.orderBy(F.desc("mass"), "grp").rowsBetween(Window.unboundedPreceding, 0)
    wasc = Window.orderBy("mass", "grp")
    per = (
        g.crossJoin(F.broadcast(tot))
        .withColumn("share", F.col("mass").cast("double") / F.col("m_tot"))
        .withColumn("cum_mass", F.sum("mass").over(wcum))
        .withColumn("rank_asc", F.row_number().over(wasc))
    )
    # Gini needs Σ(2·rank − G − 1)·mass with G the group count — rank and G
    # are both per-row columns after the crossJoin, so compute the exact
    # integer numerator per row first, then one SUM.
    per2 = per.withColumn(
        "gini_term", (2 * F.col("rank_asc").cast("long") - F.col("n_grps") - 1) * F.col("mass")
    )
    scal = per2.agg(
        (
            F.sum(F.round(-F.col("share") * F.log("share") * 1e9).cast("long")).cast("double")
            / 1e9
        ).alias("entropy"),
        (
            F.max("sq_sum").cast("double")
            / (F.max("m_tot").cast("double") * F.max("m_tot").cast("double"))
        ).alias("hhi"),
        (
            F.sum("gini_term").cast("double")
            / (F.max("n_grps").cast("double") * F.max("m_tot").cast("double"))
        ).alias("gini"),
    )
    return (
        per2.select(
            F.col("grp").alias(group_col),
            "mass",
            F.round("share", 9).alias("share"),
            F.round(F.col("cum_mass").cast("double") / F.col("m_tot"), 9).alias("cum_share"),
        )
        .crossJoin(F.broadcast(scal.select(F.round("entropy", 9).alias("entropy"),
                                           F.round("hhi", 9).alias("hhi"),
                                           F.round("gini", 9).alias("gini"))))
    )
