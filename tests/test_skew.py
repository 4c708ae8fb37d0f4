"""Salted join: equality with the plain join on a skewed key set."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_event_tracker_spark.operators.skew import salted_join


def test_salted_join_matches_plain(spark):
    # 90% of rows share one hot key
    big = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(0, 50).select(F.col("id").alias("k"), (F.col("id") * 100).alias("w"))
    plain = big.join(small, "k").select("k", "v", "w")
    salted = salted_join(big, small, "k").select("k", "v", "w")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_aqe_splits_skewed_join_at_runtime(spark):
    """AQE skew-join evidence: a sort-merge join whose build of one hot key
    dwarfs the rest must be re-planned at runtime — the executed plan shows
    ``SortMergeJoin(skew=true)`` over an ``AQEShuffleRead skewed``.  This is
    the runtime complement to ``salted_join`` (the explicit form): at 100 TB
    the zero-address/mega-contract partitions split without any code change.
    Thresholds are lowered so the ~200k-row fixture crosses the skew bar."""
    tuned = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        big = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 < 19, F.lit(1)).otherwise(F.col("id") % 40).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        small = spark.range(0, 40).select(F.col("id").alias("k"), (F.col("id") * 7).alias("w"))
        j = big.join(small, "k")
        n = j.count()
        assert n == 200_000
        j.collect()  # materialize the join itself so AQE finalizes ITS plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
