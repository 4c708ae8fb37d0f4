"""As-of (point-in-time) join — enrich each left row with the most recent
right row at or before its timestamp, per key.

Spark has no ASOF JOIN operator; the naive encoding (range-predicate join
+ aggregation) is a partial cross join per key.  This implementation is
the scalable union-window form:

    union(tagged left, tagged right)
      → one shuffle, partitioned by key, sorted by (ts, tag)
      → last(right_value, ignorenulls) over rows unbounded preceding
      → keep left rows

One shuffle total, no key-local cross product, works at any skew AQE can
split.  Ties (left.ts == right.ts) resolve to the right row — i.e. the
inclusive `left.ts >= right.ts` match, same as DuckDB/kdb ASOF."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = (),
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows + the latest right row with right_ts <= left_ts per key.

    ``value_cols`` are the right-side columns carried over (each emitted
    as ``<col><suffix>``); the right timestamp itself is always carried
    as ``<right_ts><suffix>``."""
    on = list(on)
    reserved = {"_tag", "_ats"} | {f"_r_{c}" for c in (right_ts, *value_cols)}
    clash = reserved & set(left.columns) | reserved & set(right.columns)
    if clash:
        raise ValueError(f"asof_join reserved column names in input: {sorted(clash)}")
    carry = [right_ts, *value_cols]
    lt = left.withColumn("_tag", F.lit(1)).withColumn("_ats", F.col(left_ts))
    rt = right.withColumn("_tag", F.lit(0)).withColumn("_ats", F.col(right_ts))
    for c in carry:
        lt = lt.withColumn(f"_r_{c}", F.lit(None).cast(dict(rt.dtypes)[c]))
        rt = rt.withColumn(f"_r_{c}", F.col(c))
    both = lt.select(
        *on, "_tag", "_ats", *[f"_r_{c}" for c in carry],
        *[F.col(c) for c in left.columns if c not in on],
    ).unionByName(
        rt.select(
            *on, "_tag", "_ats", *[f"_r_{c}" for c in carry],
            *[F.lit(None).cast(dict(lt.dtypes)[c]).alias(c) for c in left.columns if c not in on],
        )
    )
    # right rows sort before left rows at equal ts → inclusive match
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ats"), F.col("_tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = both.select(
        "*", *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}") for c in carry]
    )
    return filled.where(F.col("_tag") == 1).select(
        *on,
        *[c for c in left.columns if c not in on],
        *[f"{c}{suffix}" for c in carry],
    )
