"""Pins for the declarative data-quality expectation suite
(operators/expectations.py) and the median/MAD robust outlier operator
(operators/profile.py mad_outliers).

The registry entries (`dq_expectations_orders`, `outliers_mad_lineitem`)
grade both against DuckDB; these tests pin the semantics the oracle
cannot see: exact metric values on planted violations, the empty-input
contract, the MAD==0 degenerate rule, NULL handling, repartition
determinism, and the one-scan / one-exchange plan shapes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eth_event_tracker_spark.operators import expectations as X
from eth_event_tracker_spark.operators.profile import mad_outliers


def _report(df, checks):
    rows = X.run_suite(df, checks).collect()
    return {r["check"]: r for r in rows}


@pytest.fixture(scope="module")
def qc_df(spark):
    # 8 rows: 2 NULL ids, one dup key, one out-of-range price, one bad code
    data = [
        (1, 10.0, "AA"),
        (1, 20.0, "AB"),  # dup key
        (2, 30.0, "AC"),
        (3, -5.0, "AD"),  # out of range
        (4, 40.0, "a9"),  # regex miss
        (None, 50.0, "AE"),
        (None, 60.0, "AF"),
        (5, None, "AG"),
    ]
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("price", T.DoubleType()),
            T.StructField("code", T.StringType()),
        ]
    )
    return spark.createDataFrame(data, schema)


class TestExpectations:
    def test_planted_metrics(self, qc_df):
        rep = _report(
            qc_df,
            [
                X.row_count(lo=1),
                X.completeness("id", 1.0),
                X.distinctness("id", 1.0),
                X.in_range("price", 0, 100, 1.0),
                X.matches("code", "^[A-Z]{2}$", 1.0),
                X.in_set("code", ["AA", "AB", "AC", "AD", "AE", "AF", "AG"], 1.0),
                X.mean_between("price", 0.0, 100.0),
            ],
        )
        assert rep["row_count"]["value"] == 8.0 and rep["row_count"]["passed"]
        # 6 of 8 ids non-null
        c = rep["completeness(id)"]
        assert c["value"] == 6.0 / 8.0 and not c["passed"]
        # 5 distinct over 6 non-null (the dup key)
        d = rep["distinctness(id)"]
        assert d["value"] == 5.0 / 6.0 and not d["passed"]
        # 6 of 7 non-null prices in [0, 100]
        r = rep["in_range(price)"]
        assert r["value"] == 6.0 / 7.0 and not r["passed"]
        # 7 of 8 codes match ^[A-Z]{2}$
        m = rep["matches(code)"]
        assert m["value"] == 7.0 / 8.0 and not m["passed"]
        s = rep["in_set(code)"]
        assert s["value"] == 7.0 / 8.0 and not s["passed"]
        mean = rep["mean_between(price)"]
        assert mean["value"] == pytest.approx(205.0 / 7.0) and mean["passed"]

    def test_all_green_suite(self, qc_df):
        clean = qc_df.where(F.col("id").isNotNull() & (F.col("id") != 1))
        rep = _report(
            clean,
            [X.row_count(lo=1), X.completeness("id"), X.distinctness("id")],
        )
        assert all(r["passed"] for r in rep.values())

    def test_empty_input_contract(self, spark, qc_df):
        empty = qc_df.where(F.lit(False))
        rep = _report(
            empty,
            [X.row_count(lo=1), X.completeness("id"), X.mean_between("price", 0, 1)],
        )
        # row_count measures 0 and fails its lo=1 bound
        assert rep["row_count"]["value"] == 0.0 and not rep["row_count"]["passed"]
        # ratio metrics are undefined (0/0) -> NULL value, passed=False
        assert rep["completeness(id)"]["value"] is None
        assert rep["completeness(id)"]["passed"] is False
        assert rep["mean_between(price)"]["value"] is None
        assert rep["mean_between(price)"]["passed"] is False

    def test_single_scan_plan(self, spark, sf_dir):
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        suite = [
            X.row_count(lo=1),
            X.completeness("o_custkey"),
            X.in_range("o_totalprice", 0, 500000),
            X.mean_between("o_totalprice", 0, 500000),
        ]
        plan = X.run_suite(o, suite)._jdf.queryExecution().executedPlan().toString()
        # every check folds into ONE pass over the table
        assert plan.count("Scan parquet") == 1
        assert "BatchEvalPython" not in plan

    def test_shared_aggregates_deduped(self, qc_df):
        # completeness(id) and row_count share __rows; suite still correct
        rep = _report(qc_df, [X.completeness("id", 0.5), X.row_count(lo=8, hi=8)])
        assert rep["row_count"]["passed"] and rep["completeness(id)"]["passed"]


@pytest.fixture(scope="module")
def mad_df(spark):
    a = [("a", 10.0)] * 4 + [("a", 100.0)]
    b = [("b", float(v)) for v in range(1, 10)] + [("b", 100.0)]
    n = [("n", 1.0), ("n", None), ("n", 2.0), ("n", 3.0)]
    return spark.createDataFrame(
        a + b + n,
        T.StructType(
            [
                T.StructField("g", T.StringType()),
                T.StructField("v", T.DoubleType()),
            ]
        ),
    )


class TestMadOutliers:
    def test_planted_outlier(self, mad_df):
        out = mad_outliers(mad_df, "g", "v", k=3).collect()
        by_g = {}
        for r in out:
            by_g.setdefault(r["g"], []).append(r)
        # group b: med 5.5, mad 2.5 (quantized x10000) — only 100.0 flagged
        b = by_g["b"]
        assert all(r["med"] == 5.5 * 10000 for r in b)
        assert all(r["mad"] == 2.5 * 10000 for r in b)
        flagged = [r["v"] for r in b if r["is_outlier"]]
        assert flagged == [100.0]

    def test_mad_zero_flags_any_deviation(self, mad_df):
        # group a: >= half identical -> mad == 0 -> every deviating row is
        # an outlier (the textbook rule's documented behavior)
        out = [r for r in mad_outliers(mad_df, "g", "v", k=3).collect() if r["g"] == "a"]
        assert all(r["mad"] == 0.0 for r in out)
        assert sorted(r["v"] for r in out if r["is_outlier"]) == [100.0]
        assert sum(not r["is_outlier"] for r in out) == 4

    def test_null_values_have_null_flags(self, mad_df):
        out = [r for r in mad_outliers(mad_df, "g", "v").collect() if r["g"] == "n"]
        nulls = [r for r in out if r["v"] is None]
        assert len(nulls) == 1 and nulls[0]["is_outlier"] is None
        # percentiles ignored the NULL: med of {1,2,3} = 2
        assert all(r["med"] == 2.0 * 10000 for r in out)

    def test_repartition_deterministic(self, mad_df):
        one = mad_outliers(mad_df.repartition(1), "g", "v").orderBy("g", "v")
        many = mad_outliers(mad_df.repartition(7), "g", "v").orderBy("g", "v")
        assert [r.asDict() for r in one.collect()] == [
            r.asDict() for r in many.collect()
        ]

    def test_single_exchange_plan(self, mad_df):
        plan = (
            mad_outliers(mad_df.repartition(4), "g", "v")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # both medians ride ONE partitionBy(g) exchange (ignore the
        # explicit .repartition(4) RoundRobin above it)
        assert plan.count("hashpartitioning") <= 1

    def test_approx_tier_matches_on_small_groups(self, mad_df):
        exact = mad_outliers(mad_df, "g", "v").orderBy("g", "v")
        approx = mad_outliers(mad_df, "g", "v", approx=True).orderBy("g", "v")
        assert [
            (r["g"], r["v"], r["is_outlier"]) for r in exact.collect()
        ] == [(r["g"], r["v"], r["is_outlier"]) for r in approx.collect()]


@pytest.fixture(scope="module")
def wz_df(spark):
    # group w: 1..8 plus a wild 1000 -> Q1/Q3 interpolate on dyadic
    # positions; group c: constant (IQR 0 -> fences collapse to the
    # constant, every deviation clips); NULL row stays NULL
    w = [("w", float(v)) for v in range(1, 9)] + [("w", 1000.0)]
    c = [("c", 5.0)] * 4 + [("c", 9.0), ("c", None)]
    return spark.createDataFrame(
        w + c,
        T.StructType(
            [
                T.StructField("g", T.StringType()),
                T.StructField("v", T.DoubleType()),
            ]
        ),
    )


class TestWinsorizeTukey:
    def test_planted_fences_and_clip(self, wz_df):
        from eth_event_tracker_spark.operators.profile import winsorize_tukey

        out = [r for r in winsorize_tukey(wz_df, "g", "v").collect() if r["g"] == "w"]
        # n=9 values {1..8, 1000} quantized x10000: Q1 at pos 2 -> 3.0,
        # Q3 at pos 6 -> 7.0, IQR 4 -> fences [-3, 13] (x10000)
        assert all(r["lo_fence"] == -3.0 * 10000 for r in out)
        assert all(r["hi_fence"] == 13.0 * 10000 for r in out)
        clipped = sorted(r["clipped"] for r in out)
        assert clipped == sorted(
            [v * 10000.0 for v in range(1, 9)] + [13.0 * 10000]
        ), "only the wild value clips, and exactly to the hi fence"

    def test_constant_group_and_null(self, wz_df):
        from eth_event_tracker_spark.operators.profile import winsorize_tukey

        out = [r for r in winsorize_tukey(wz_df, "g", "v").collect() if r["g"] == "c"]
        # values {5,5,5,5,9}: Q1 = Q3 = 5 -> IQR 0 -> both fences 5;
        # the 9 clips down to 5
        vals = {r["v"]: r for r in out if r["v"] is not None}
        assert vals[9.0]["clipped"] == 5.0 * 10000
        assert vals[5.0]["clipped"] == 5.0 * 10000
        nulls = [r for r in out if r["v"] is None]
        assert len(nulls) == 1 and nulls[0]["clipped"] is None, (
            "NULL must stay NULL (least/greatest would silently clip it "
            "to the low fence without the guard)"
        )

    def test_one_exchange_plan(self, wz_df):
        from eth_event_tracker_spark.operators.profile import winsorize_tukey

        plan = (
            winsorize_tukey(wz_df.repartition(4), "g", "v")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("hashpartitioning") <= 1

    def test_repartition_deterministic(self, wz_df):
        from eth_event_tracker_spark.operators.profile import winsorize_tukey

        a = winsorize_tukey(wz_df.repartition(1), "g", "v").orderBy("g", "v")
        b = winsorize_tukey(wz_df.repartition(7), "g", "v").orderBy("g", "v")
        assert [r.asDict() for r in a.collect()] == [r.asDict() for r in b.collect()]
