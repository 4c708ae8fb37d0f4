"""Session-keyed cache lifecycle: the memoized derived-logs and shingle
tables must die with their SparkSession — a long-lived multi-session
process (a pytest run, a notebook server) must not accumulate dead
sessions or their executor-cached DataFrames.

One pin is pyspark's own, not ours: ``SparkSession.__init__`` monkey-
patches ``RDD.toDF`` with a closure over the newly-created session, so
the MOST RECENT session is always reachable from the global RDD class.
That slot holds exactly one session (each new session overwrites it), so
the tests displace it with a fresh throwaway session before asserting
collectability — what must NOT exist is per-session growth from our
caches."""

from __future__ import annotations

import gc
import weakref

from eth_event_tracker_spark import tables
from eth_event_tracker_spark.queries import llmdata


def _displace_rdd_todf_pin(spark):
    # overwrite pyspark's RDD.toDF closure (which pins the last-created
    # session) with one over the long-lived fixture session
    from pyspark.sql.session import _monkey_patch_RDD

    _monkey_patch_RDD(spark)


def test_derived_logs_cache_dies_with_session(spark, sf_dir):
    s2 = spark.newSession()
    df = tables.derived_logs(s2, sf_dir)
    assert df.count() > 0
    # memoized: same object back on a second call
    assert tables.derived_logs(s2, sf_dir) is df
    per = getattr(s2, tables._DERIVED_LOGS_CACHE_ATTR)
    assert sf_dir in per
    ref = weakref.ref(s2)
    del df, per, s2
    _displace_rdd_todf_pin(spark)
    gc.collect()
    assert ref() is None, "session (and its cached DataFrames) must be collectable"


def test_derived_blocks_cache_dies_with_session(spark, sf_dir):
    s2 = spark.newSession()
    df = tables.derived_blocks(s2, sf_dir, fork=True)
    assert df.count() > 0
    # memoized per (sf_dir, fork): same object back, fork flag keyed
    assert tables.derived_blocks(s2, sf_dir, fork=True) is df
    assert tables.derived_blocks(s2, sf_dir, fork=False) is not df
    ref = weakref.ref(s2)
    del df, s2
    _displace_rdd_todf_pin(spark)
    gc.collect()
    assert ref() is None, "session (and its cached blocks dim) must be collectable"


def test_shingle_cache_dies_with_session(spark, sf_dir):
    s2 = spark.newSession()
    sh = llmdata._doc_shingles(s2, sf_dir)
    assert llmdata._doc_shingles(s2, sf_dir) is sh
    ref = weakref.ref(s2)
    del sh, s2
    _displace_rdd_todf_pin(spark)
    gc.collect()
    assert ref() is None, "session (and its cached shingle table) must be collectable"
