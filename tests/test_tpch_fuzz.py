"""Property fuzz for the trickiest TPC-H decorrelations: the REGISTRY
query code runs on RANDOMIZED tables (written as parquet under a tmp
sf_dir, so `load_table` and the full real plan are exercised) and must
hash-match DuckDB running the registry's own oracle SQL on the same
files.

Why these three:
- q17: the exact-BIGINT threshold (qty·5·n < sum) exists precisely for
  boundary rows where qty == 0.2·avg — random small quantities hit that
  boundary constantly, which one fixed fixture never does.
- q21: EXISTS + NOT EXISTS with inequality residuals — random multi-
  supplier order compositions sweep the semi/anti edge cases (single-
  supplier orders, all-R orders, same-supplier repeats).
- q13: LEFT OUTER with an ON-clause predicate — random order sets sweep
  customers whose orders are ALL filtered out (the bucket that a WHERE
  placement would lose).
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from eth_event_tracker_spark.queries import REGISTRY, _load

_load()

BASE = dt.datetime(1996, 1, 1)


def _write(path, name, cols: dict) -> None:
    pq.write_table(pa.table(cols), str(path / f"{name}.parquet"))


def _compare(spark, tmpdir, qname: str) -> None:
    q = REGISTRY[qname]
    sp = q.fn(spark, str(tmpdir)).toPandas()
    con = duckdb.connect()
    for f in tmpdir.iterdir():
        if f.suffix == ".parquet":
            con.execute(f"CREATE VIEW {f.stem} AS SELECT * FROM read_parquet('{f}')")
    du = con.execute(q.oracle).fetchdf()
    con.close()

    def canon(v):
        if v is None:
            return "N"
        if isinstance(v, float):
            return "N" if math.isnan(v) else repr(v)
        return str(v)

    assert len(sp) == len(du), f"{qname}: rows {len(sp)} != {len(du)}"
    assert sorted(sp.columns) == sorted(du.columns)
    a = (
        sp.reindex(sorted(sp.columns), axis=1)
        .apply(lambda c: c.map(canon))
        .sort_values(by=sorted(sp.columns))
        .reset_index(drop=True)
    )
    b = (
        du.reindex(sorted(du.columns), axis=1)
        .apply(lambda c: c.map(canon))
        .sort_values(by=sorted(du.columns))
        .reset_index(drop=True)
    )
    assert a.equals(b), f"{qname}: value mismatch\n{a}\n{b}"


_lineitem = st.lists(
    st.tuples(
        st.integers(1, 12),  # orderkey
        st.integers(1, 6),  # partkey
        st.integers(1, 5),  # suppkey
        st.integers(1, 50),  # quantity (integral — the fixture contract)
        st.integers(100, 99999),  # extendedprice in cents
        st.sampled_from("ANR"),
    ),
    min_size=1,
    max_size=60,
)


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("tpch_fuzz")


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_lineitem, brand23=st.lists(st.booleans(), min_size=6, max_size=6))
def test_q17_threshold_boundary_fuzz(spark, fuzz_dir, rows, brand23):
    d = fuzz_dir / "q17"
    d.mkdir(exist_ok=True)
    _write(
        d,
        "lineitem",
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
            "l_quantity": pa.array([float(r[3]) for r in rows], pa.float64()),
            "l_extendedprice": pa.array([r[4] / 100.0 for r in rows], pa.float64()),
            "l_discount": pa.array([0.05] * len(rows), pa.float64()),
            "l_returnflag": pa.array([r[5] for r in rows], pa.string()),
            "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
            "l_shipdate": pa.array([BASE] * len(rows), pa.timestamp("us")),
        },
    )
    _write(
        d,
        "part",
        {
            "p_partkey": pa.array(list(range(1, 7)), pa.int64()),
            "p_name": pa.array([f"part {i}" for i in range(1, 7)], pa.string()),
            "p_brand": pa.array(
                ["Brand#23" if b else "Brand#11" for b in brand23], pa.string()
            ),
            "p_type": pa.array(["STANDARD"] * 6, pa.string()),
            "p_size": pa.array([5] * 6, pa.int32()),
            "p_retailprice": pa.array([100.0] * 6, pa.float64()),
        },
    )
    _compare(spark, d, "q17_small_qty_revenue")


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=_lineitem,
    statuses=st.lists(st.sampled_from("OFP"), min_size=12, max_size=12),
)
def test_q21_semi_anti_residual_fuzz(spark, fuzz_dir, rows, statuses):
    d = fuzz_dir / "q21"
    d.mkdir(exist_ok=True)
    _write(
        d,
        "lineitem",
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
            "l_quantity": pa.array([float(r[3]) for r in rows], pa.float64()),
            "l_extendedprice": pa.array([r[4] / 100.0 for r in rows], pa.float64()),
            "l_discount": pa.array([0.0] * len(rows), pa.float64()),
            "l_returnflag": pa.array([r[5] for r in rows], pa.string()),
            "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
            "l_shipdate": pa.array([BASE] * len(rows), pa.timestamp("us")),
        },
    )
    _write(
        d,
        "orders",
        {
            "o_orderkey": pa.array(list(range(1, 13)), pa.int64()),
            "o_custkey": pa.array([1] * 12, pa.int64()),
            "o_orderstatus": pa.array(list(statuses), pa.string()),
            "o_totalprice": pa.array([100.0] * 12, pa.float64()),
            "o_orderdate": pa.array([BASE] * 12, pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 12, pa.string()),
        },
    )
    # suppliers 1-5 spread over the three filtered nations + two others
    _write(
        d,
        "supplier",
        {
            "s_suppkey": pa.array(list(range(1, 6)), pa.int64()),
            "s_name": pa.array([f"supp{i}" for i in range(1, 6)], pa.string()),
            "s_nationkey": pa.array([12, 13, 15, 1, 2], pa.int32()),
            "s_acctbal": pa.array([0.0] * 5, pa.float64()),
        },
    )
    _write(
        d,
        "nation",
        {
            "n_nationkey": pa.array([12, 13, 15, 1, 2], pa.int32()),
            "n_name": pa.array(
                ["NATION_12", "NATION_13", "NATION_15", "NATION_1", "NATION_2"],
                pa.string(),
            ),
            "n_regionkey": pa.array([0] * 5, pa.int32()),
        },
    )
    _compare(spark, d, "q21_suppliers_waiting")


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    orders=st.lists(
        st.tuples(st.integers(1, 8), st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"])),
        min_size=0,
        max_size=30,
    )
)
def test_q13_on_clause_outer_fuzz(spark, fuzz_dir, orders):
    d = fuzz_dir / "q13"
    d.mkdir(exist_ok=True)
    _write(
        d,
        "customer",
        {
            "c_custkey": pa.array(list(range(1, 9)), pa.int64()),
            "c_name": pa.array([f"c{i}" for i in range(1, 9)], pa.string()),
            "c_nationkey": pa.array([1] * 8, pa.int32()),
            "c_acctbal": pa.array([0.0] * 8, pa.float64()),
            "c_mktsegment": pa.array(["BUILDING"] * 8, pa.string()),
        },
    )
    _write(
        d,
        "orders",
        {
            "o_orderkey": pa.array(list(range(1, len(orders) + 1)), pa.int64()),
            "o_custkey": pa.array([c for c, _ in orders], pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(orders), pa.string()),
            "o_totalprice": pa.array([10.0] * len(orders), pa.float64()),
            "o_orderdate": pa.array([BASE] * len(orders), pa.timestamp("us")),
            "o_orderpriority": pa.array([p for _, p in orders], pa.string()),
        },
    )
    _compare(spark, d, "q13_customer_distribution")
