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
