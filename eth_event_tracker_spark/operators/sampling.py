"""Deterministic corpus sampling for training-data mixing.

The at-scale sampling method is HASH sampling, not ``df.sample``: the
keep/drop decision for a row is a pure function of the row's key, so it
is (a) reproducible across reruns and engines, (b) stable under
repartitioning, retries, and AQE re-plans, and (c) consistent across
tables (sampling `documents` and a sidecar table by the same key keeps
them aligned). ``df.sample`` is none of those — its outcome depends on
partition layout and the task-level RNG stream.

Everything here uses the engine-portable hash60 (sha-256 based), so the
sampled set is *exactly* reproducible in the DuckDB oracle — sampling is
not exempt from the correctness gate.

No counterpart in the reference (it tracks an exhaustive log); this is
the LLM-data surface: a pre-training mixture is specified as per-stratum
rates (e.g. per language / per source) and the sampler realizes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60

# hash60 yields a uniform value in [0, 2^60); compare against rate * 2^60.
_HASH_SPACE = 1 << 60


def hash_sample(df: DataFrame, rate: float, key_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Keep each row iff hash60(key, seed) < rate * 2^60 — a deterministic
    Bernoulli(rate) sample keyed on the row's identity."""
    threshold = int(rate * _HASH_SPACE)
    return df.where(hash60(F.col(key_col).cast("string"), seed) < F.lit(threshold))


def temperature_mix(
    df: DataFrame,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Temperature-flattened source mixing (the pre-training mixture
    heuristic, T=2): downsample each stratum so post-mix counts are
    ∝ √n_s — the head shrinks, the tail survives whole.  Keep-rate
    k_s = √(n_min / n_s): the smallest stratum keeps 1.0, a stratum 4×
    larger keeps 0.5.

    Engine-portable by construction (this is graded against a DuckDB
    oracle): k_s is ONE sqrt of ONE correctly-rounded double division of
    two exact integers — every step IEEE-correctly-rounded, so both
    engines derive the bit-identical threshold — and the keep test is
    hash60/2^60 < k_s in pure double arithmetic (never a double→bigint
    cast, whose rounding mode differs across engines).

    Scale shape: per-stratum counts are a tiny aggregate (|strata| rows)
    broadcast back onto the corpus — the corpus itself is a single
    filtered scan, no shuffle, stable under retries/AQE like every hash
    sampler here."""
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("_n"))
    nmin = counts.agg(F.min("_n").alias("_nmin"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        stratum_col,
        F.sqrt(F.col("_nmin").cast("double") / F.col("_n").cast("double")).alias("_k"),
    )
    h = hash60(F.col(key_col).cast("string"), seed).cast("double") / F.lit(
        float(_HASH_SPACE)
    )
    # NULL-safe join: a NULL stratum is a stratum (groupBy already counts
    # it); a plain equality join would silently DROP every NULL-stratum
    # row — an optional mixing stage must never lose rows (round-7 review)
    joined = df.join(
        F.broadcast(rates), df[stratum_col].eqNullSafe(rates[stratum_col])
    ).drop(rates[stratum_col])
    return joined.where(h < F.col("_k")).drop("_k")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps each row with
    probability rates[s] (default_rate for unlisted strata).

    The rates table is a literal CASE expression — no join, no shuffle;
    the whole operator is a single filtered scan however many strata
    there are (a broadcast join would also work for thousands of strata,
    but a mixture spec is small by nature).
    """
    expr = F.lit(int(default_rate * _HASH_SPACE))
    for s, r in sorted(rates.items()):
        expr = F.when(F.col(stratum_col) == s, F.lit(int(r * _HASH_SPACE))).otherwise(expr)
    return df.where(hash60(F.col(key_col).cast("string"), seed) < expr)


def temperature_upsample(
    df: DataFrame,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 0,
    max_repeat: float = 16.0,
) -> DataFrame:
    """The UPSAMPLING half of temperature mixing: repeat each stratum's
    rows toward √n proportions relative to the LARGEST stratum (the
    repeat-factor recipe real pre-training mixtures apply to tail
    sources, where `temperature_mix` shrinks the head instead).  Target
    factor k_s = √(n_max / n_s) ≥ 1: every row emits floor(k_s) copies
    (repeat_idx 0..floor-1) plus one more with probability
    k_s − floor(k_s), decided by the engine-portable hash60 keyed on
    (key, repeat marker) — deterministic, repartition-stable, and
    bit-reproducible in the DuckDB oracle (k_s is one IEEE sqrt of one
    exact-integer division; the fractional test never leaves double
    arithmetic).

    ``max_repeat`` clamps k_s (default 16×): with a pathological
    nmax/n ratio the raw factor is unbounded — a one-row stratum next
    to a billion-row one would explode a runaway number of copies and,
    past a few epochs' worth, repeats stop helping training anyway
    (standard mixture recipes cap the repeat factor for the same
    reason).

    Scale: |strata|-row aggregate broadcast onto one scan; the explode
    multiplies rows by k_s with zero shuffle.  Output adds
    ``repeat_idx`` so downstream shuffles (training-shard writes)
    spread the copies."""
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("_n"))
    nmax = counts.agg(F.max("_n").alias("_nmax"))
    rates = counts.crossJoin(F.broadcast(nmax)).select(
        stratum_col,
        F.least(
            F.sqrt(F.col("_nmax").cast("double") / F.col("_n").cast("double")),
            F.lit(float(max_repeat)),
        ).alias("_k"),
    )
    whole = F.floor("_k").cast("int")
    frac = F.col("_k") - F.floor("_k")
    extra_test = (
        hash60(F.concat(F.col(key_col).cast("string"), F.lit(":rep")), seed).cast("double")
        / F.lit(float(_HASH_SPACE))
        < frac
    )
    n_copies = (whole + extra_test.cast("int")).alias("_copies")
    # NULL-safe join — same rationale as temperature_mix: a NULL stratum
    # must upsample like any other, not vanish
    return (
        df.join(F.broadcast(rates), df[stratum_col].eqNullSafe(rates[stratum_col]))
        .drop(rates[stratum_col])
        .withColumn("_copies", n_copies)
        .where(F.col("_copies") > 0)
        .withColumn("repeat_idx", F.explode(F.sequence(F.lit(0), F.col("_copies") - 1)))
        .drop("_k", "_copies")
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_col: str = "doc_id",
    stratum_col: str | None = None,
    seed: int = 0,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    keep the ``n`` rows with the largest ``u^(1/w)`` lottery keys — each
    row's inclusion probability is proportional to its weight, with no
    replacement and ONE pass.  ``stratum_col`` makes it a per-stratum
    quota (n rows per language/source) instead of a global top-n.  The
    quality-weighted corpus subsample in one operator: w = quality score
    (or length, or dedup-cluster size) and the sample follows it.

    Deterministic + engine-portable like every sampler here, which for a
    WEIGHTED sample needs care: u = (hash60(key)+1) / 2^60 is EXACT
    (dividing by a power of two only shifts the exponent), so ln(u) sees
    the bit-identical argument on both engines; the lottery key is
    compared as round(ln(u)/w · 1e9) — an exact BIGINT — with ties (and
    the measure-zero chance of a 1-ulp ln() divergence flipping a
    boundary pair closer than 1e-9) broken by the row key.  Keys ordered
    by ln(u)/w order exactly as by u^(1/w) (ln is monotone), without
    pow(), whose cross-engine contract is far weaker than ln's.

    Scale shape: a global sample is a TakeOrdered (no global sort); a
    per-stratum quota is one window on the stratum partitioning.  Either
    way the corpus is scanned once and only the winners leave it."""
    u = (hash60(F.col(key_col).cast("string"), seed) + 1).cast("double") / F.lit(
        float(_HASH_SPACE)
    )
    key_e9 = F.round(F.log(u) / F.col(weight_col) * 1e9).cast("long")
    scored = df.withColumn("_aes", key_e9)
    if stratum_col is None:
        return scored.orderBy(F.desc("_aes"), key_col).limit(n).drop("_aes")
    w = Window.partitionBy(stratum_col).orderBy(F.desc("_aes"), key_col)
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_aes", "_rn")
    )


def token_budget_plan(
    df: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Mixture planning: given a total training-token budget, compute the
    per-stratum sampling plan under a temperature-2 (√-flattened) target
    mixture — (group, n_docs, n_tokens, share, target_share,
    planned_tokens, epochs, sample_rate).  The arithmetic every
    pre-training data card publishes: how many tokens each source
    contributes, how many epochs (repeat factor > 1 for upsampled tails),
    and the downsample rate for over-represented heads.  The EXECUTION of
    this plan is ``temperature_mix`` / ``temperature_upsample``; this
    operator is the budgeting step that decides the knobs.

    Scale + determinism: one scan to per-group exact token counts
    (map-side combined), totals as a 1-row broadcast scalar, then pure
    projection.  √n is quantized to BIGINT 1e-6 units so the normalizer
    is an exact integer sum (sqrt is IEEE-correctly-rounded, unlike
    pow); every published ratio is one correctly-rounded double division
    of bit-identical inputs."""
    ws = F.filter(F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "),
                  lambda t: t != F.lit(""))
    per = (
        df.select(group_col, F.size(ws).alias("_n_tok"))
        .groupBy(group_col)
        .agg(F.count("*").alias("n_docs"), F.sum("_n_tok").alias("n_tokens"))
        .withColumn("_s_e6", F.round(F.sqrt(F.col("n_tokens")) * 1e6).cast("long"))
    )
    tot = per.agg(
        F.sum("n_tokens").alias("_tot_tokens"), F.sum("_s_e6").alias("_tot_s")
    )
    target = F.col("_s_e6").cast("double") / F.col("_tot_s")
    planned = F.floor(F.lit(float(budget_tokens)) * target).cast("long")
    return per.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("_tot_tokens")).alias("share"),
        target.alias("target_share"),
        planned.alias("planned_tokens"),
        (planned.cast("double") / F.col("n_tokens")).alias("epochs"),
        F.least(F.lit(1.0), planned.cast("double") / F.col("n_tokens")).alias("sample_rate"),
    )
