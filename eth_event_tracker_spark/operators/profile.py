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

from pyspark.sql import DataFrame
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
