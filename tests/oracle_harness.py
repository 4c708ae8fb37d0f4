"""Local mirror of the driver's correctness gate: run a Spark query and its
DuckDB oracle, compare row count, column names, and values
(order-insensitive, column-name-sorted) — stricter locally than the driver
so drift surfaces before a round is graded."""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values for cross-engine compare
    def canon(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "∅"
            return repr(v)  # exact double repr — catches any fp divergence
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(canon(x) for x in v) + "]"
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    out = df.apply(lambda col: col.map(canon))
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def compare(spark_df, duck_con, oracle_sql: str, name: str = "") -> None:
    import numpy as np

    sp = spark_df.toPandas()
    du = duck_con.execute(oracle_sql).fetchdf()
    # numpy arrays from duckdb lists -> python lists
    for c in du.columns:
        if du[c].dtype == object:
            du[c] = du[c].map(lambda v: list(v) if isinstance(v, np.ndarray) else v)
    for c in sp.columns:
        if sp[c].dtype == object:
            sp[c] = sp[c].map(lambda v: list(v) if isinstance(v, np.ndarray) else v)
    assert len(sp) == len(du), f"{name}: row count {len(sp)} (spark) != {len(du)} (duckdb)"
    assert sorted(sp.columns) == sorted(du.columns), (
        f"{name}: columns {sorted(sp.columns)} != {sorted(du.columns)}"
    )
    nsp, ndu = _normalize(sp), _normalize(du)
    if not nsp.equals(ndu):
        diff_rows = (nsp != ndu).any(axis=1)
        sample = pd.concat(
            [nsp[diff_rows].head(5).add_suffix("_spark"), ndu[diff_rows].head(5).add_suffix("_duck")],
            axis=1,
        )
        raise AssertionError(f"{name}: value mismatch in {int(diff_rows.sum())} rows\n{sample}")
