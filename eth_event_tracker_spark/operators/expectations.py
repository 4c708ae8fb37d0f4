"""Declarative data-quality expectation suites (the Deequ/Great-
Expectations tier): a set of named checks — completeness, distinctness,
range/regex/set compliance, row count, mean bounds — evaluated over a
table in ONE aggregate pass, returning a per-check report row with the
measured metric, its bounds, and a pass verdict.

This is the "data contract" gate a 100 TB ingestion pipeline runs before
publishing a snapshot: assertions about the data, not the code.  The
reference repo validates its inputs imperatively (genesis/chain-id
fingerprints, `tracker.go:402-444`); this operator is the declarative,
table-level generalization an analytics engine owes its users.

Output schema (one row per check, stable order = declaration order):
    check   string   e.g. ``completeness(o_custkey)``
    value   double   the measured metric (NULL when undefined, e.g. 0/0)
    lo, hi  double   inclusive bounds (NULL = unbounded on that side)
    passed  boolean  value within bounds; false when value is NULL

100 TB shape: ALL checks fold into a single ``df.agg(...)`` — one scan,
map-side partial aggregation, a 1-row intermediate exploded to |checks|
report rows.  Ratio metrics are exact count ratios (BIGINT counts →
one double division, bit-identical across engines); mean bounds use the
repo-wide DECIMAL(18,4) sum convention so the metric is order- and
engine-independent.  ``distinctness`` defaults to exact count-distinct
(audit semantics; Spark plans it through Expand in the same single
scan); pass ``approx=True`` for the constant-memory HLL variant when an
estimate suffices at scale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation: named aggregates + a metric over them + bounds.

    ``mergeable`` marks aggregates that are cell-wise summable across
    batches (counts, decimal sums) — the property the streaming
    data-quality log (streaming/sketch.py ``dq_codec``) requires.  Exact
    count-distinct is not (``distinctness`` sets it False)."""

    name: str
    aggs: tuple  # of (alias, Column) — deduped by alias across the suite
    value: Column  # references the aliases
    lo: float | None = None
    hi: float | None = None
    mergeable: bool = True


def _ratio(num: Column, den: Column) -> Column:
    # NULL (not NaN/Inf) when the denominator is 0 — "undefined", which
    # the report maps to passed=false.
    return num.cast("double") / F.nullif(den.cast("double"), F.lit(0.0))


def _cnt(cond: Column) -> Column:
    return F.count(F.when(cond, F.lit(1)))


def completeness(col: str, min_ratio: float = 1.0) -> Check:
    """Fraction of rows where ``col`` is non-null."""
    a_nn, a_n = f"{col}__nn", "__rows"
    return Check(
        name=f"completeness({col})",
        aggs=((a_nn, F.count(F.col(col))), (a_n, F.count(F.lit(1)))),
        value=_ratio(F.col(a_nn), F.col(a_n)),
        lo=min_ratio,
    )


def distinctness(col: str, min_ratio: float = 1.0, approx: bool = False) -> Check:
    """Distinct non-null values / non-null rows (1.0 ⇔ unique key)."""
    dc = F.approx_count_distinct(F.col(col)) if approx else F.count_distinct(F.col(col))
    a_dc, a_nn = f"{col}__dc", f"{col}__nn"
    return Check(
        name=f"distinctness({col})",
        aggs=((a_dc, dc), (a_nn, F.count(F.col(col)))),
        value=_ratio(F.col(a_dc), F.col(a_nn)),
        lo=min_ratio,
        mergeable=False,
    )


def compliance(name: str, cond: Column, col: str, min_ratio: float = 1.0) -> Check:
    """Fraction of rows with non-null ``col`` where ``cond`` holds."""
    a_ok, a_nn = f"{name}__ok", f"{col}__nn"
    return Check(
        name=name,
        aggs=((a_ok, _cnt(F.col(col).isNotNull() & cond)), (a_nn, F.count(F.col(col)))),
        value=_ratio(F.col(a_ok), F.col(a_nn)),
        lo=min_ratio,
    )


def in_range(col: str, lo, hi, min_ratio: float = 1.0) -> Check:
    return compliance(
        f"in_range({col})", F.col(col).between(F.lit(lo), F.lit(hi)), col, min_ratio
    )


def matches(col: str, pattern: str, min_ratio: float = 1.0) -> Check:
    return compliance(
        f"matches({col})", F.col(col).rlike(pattern), col, min_ratio
    )


def in_set(col: str, values: list, min_ratio: float = 1.0) -> Check:
    return compliance(
        f"in_set({col})", F.col(col).isin(values), col, min_ratio
    )


def row_count(lo: float | None = 1.0, hi: float | None = None) -> Check:
    return Check(
        name="row_count",
        aggs=(("__rows", F.count(F.lit(1))),),
        value=F.col("__rows").cast("double"),
        lo=lo,
        hi=hi,
    )


def mean_between(col: str, lo: float | None, hi: float | None) -> Check:
    """Mean of ``col`` via the repo's exact DECIMAL(18,4) sum convention —
    order- and engine-independent, so the metric value is portable.  The
    stored aggregate stays DECIMAL (exact, cross-batch summable for the
    streaming dq log); ``_ratio`` casts to double once at read time."""
    a_s, a_nn = f"{col}__sumdec", f"{col}__nn"
    return Check(
        name=f"mean_between({col})",
        aggs=(
            (a_s, F.sum(F.col(col).cast("decimal(18,4)"))),
            (a_nn, F.count(F.col(col))),
        ),
        value=_ratio(F.col(a_s), F.col(a_nn)),
        lo=lo,
        hi=hi,
    )


# Serializable suite spec — the CLI / config-file form of a data
# contract: a JSON list of {"type": <builder>, ...kwargs}.  Keeping the
# contract declarative AND serializable is what lets it live next to the
# data it governs (store/wap.py writes it into _AUDIT.json evidence).
_BUILDERS = {
    "completeness": completeness,
    "distinctness": distinctness,
    "in_range": in_range,
    "matches": matches,
    "in_set": in_set,
    "row_count": row_count,
    "mean_between": mean_between,
}


def suite_from_spec(spec: list[dict]) -> list[Check]:
    """Build a suite from its JSON form; unknown types fail loudly."""
    checks = []
    for item in spec:
        kwargs = dict(item)
        kind = kwargs.pop("type", None)
        if kind not in _BUILDERS:
            raise ValueError(
                f"unknown check type {kind!r} (have {sorted(_BUILDERS)})"
            )
        checks.append(_BUILDERS[kind](**kwargs))
    return checks


def _dedup_aggs(checks: list[Check]) -> dict[str, Column]:
    seen: dict[str, Column] = {}
    for c in checks:
        for alias, agg in c.aggs:
            seen.setdefault(alias, agg.alias(alias))
    return seen


def _report(wide: DataFrame, checks: list[Check]) -> DataFrame:
    """Explode a 1-row wide frame of named aggregates into the report."""
    rows = []
    for c in checks:
        lo = F.lit(c.lo).cast("double")
        hi = F.lit(c.hi).cast("double")
        v = c.value.cast("double")
        passed = F.when(v.isNull(), F.lit(False)).otherwise(
            (lo.isNull() | (v >= lo)) & (hi.isNull() | (v <= hi))
        )
        rows.append(
            F.struct(
                F.lit(c.name).alias("check"),
                v.alias("value"),
                lo.alias("lo"),
                hi.alias("hi"),
                passed.alias("passed"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def run_suite(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate ``checks`` over ``df`` in ONE aggregate pass.

    Aggregates are deduped by alias (shared counts like ``__rows`` are
    computed once); the 1-row wide result is exploded into the report.
    """
    return _report(df.agg(*_dedup_aggs(checks).values()), checks)


# ---------------------------------------------------------------------------
# Streaming form: the suite's aggregates as a durable metrics LOG.
# Counts and decimal sums are cell-wise summable across batches
# (associative, build-path-independent), so data quality rides the same
# exactly-once sketch-log protocol as CMS/Bloom/CDF
# (streaming/sketch.py dq_codec) and the accumulated state pins
# bit-identical to a batch run_suite over the union of all batches.
# ---------------------------------------------------------------------------
_METRIC_DEC = "decimal(38,6)"


def metrics_rows(df: DataFrame, checks: list[Check]) -> DataFrame:
    """One aggregate pass → long-form metric rows ``(metric, val)``.

    ``val`` is DECIMAL(38,6): BIGINT counts and DECIMAL(18,4) sums embed
    exactly, and cross-batch folding is an exact decimal sum — no float
    drift ever enters the log.  Rejects non-mergeable checks (exact
    count-distinct cannot be summed across batches; use the HLL codec
    for distinct counts at scale)."""
    bad = [c.name for c in checks if not c.mergeable]
    if bad:
        raise ValueError(f"non-mergeable checks cannot be logged: {bad}")
    seen = _dedup_aggs(checks)
    wide = df.agg(*seen.values())
    rows = [
        F.struct(F.lit(alias).alias("metric"), F.col(alias).cast(_METRIC_DEC).alias("val"))
        for alias in seen
    ]
    return wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def report_from_metrics(folded: DataFrame, checks: list[Check]) -> DataFrame:
    """Rebuild the per-check report from folded ``(metric, val)`` rows.

    Pivots the (bounded, |aliases|-row) metric state back to the 1-row
    wide shape and reuses the exact report logic of ``run_suite`` — the
    stream and batch reports share every expression."""
    aliases = list(_dedup_aggs(checks))
    wide = folded.groupBy().pivot("metric", aliases).agg(F.first("val"))
    return _report(wide, checks)
