"""Bucketed co-located join: the persisted-shuffle strategy for recurring
100 TB joins — asserted at the plan level, not just described."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from eth_event_tracker_spark.sources.mock_chain import mock
from eth_event_tracker_spark.store import ParquetStore
from eth_event_tracker_spark.store.bucketed import co_located_join, write_bucketed
from eth_event_tracker_spark.tables import derived_blocks, derived_logs


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    logs = derived_logs(spark, sf_dir).select("block_num", "address", "value")
    blocks = derived_blocks(spark, sf_dir).select("block_num", "block_hash")
    write_bucketed(logs, "b_logs", "block_num", 8, path=str(tmp_path / "b_logs"))
    write_bucketed(blocks, "b_blocks", "block_num", 8, path=str(tmp_path / "b_blocks"))
    try:
        # fixture tables are broadcast-sized, which would hide the bucketed
        # path — force the shuffle-join planner branch the 100 TB case hits
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = co_located_join(spark, "b_logs", "b_blocks", "block_num")
        plan = _plan(j)
        assert "Bucketed: true" in plan, "scan must use the bucketing metadata"
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join must not reshuffle either side"
        )
        # same rows as the plain (shuffling) join
        plain = logs.join(blocks, "block_num")
        assert j.count() == plain.count()
        dec_sum = F.sum(F.col("value").cast("decimal(18,4)"))  # order-independent
        assert j.agg(dec_sum).collect() == plain.agg(dec_sum).collect()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_logs")
        spark.sql("DROP TABLE IF EXISTS b_blocks")


def test_compacted_bucket_rowgroups_are_indx_clustered(spark, tmp_path):
    """After compaction a bucket is one file sorted by indx, so parquet
    row-group min/max stats form disjoint indx ranges — a point lookup
    (S-7 get_log) decodes a single row group even inside a large bucket."""
    store = ParquetStore(tmp_path / "store")
    entry = store.entry("f1", bucket_size=100000)
    # several appends -> several small files in the bucket
    for num in range(1, 26):
        b = mock(num).num(num)
        for i in range(200):
            b.log(f"{num:x}{i:03x}")
        entry.store_logs(b.logs())
    assert entry.compact() > 0
    files = entry._bucket_files(0)
    assert len(files) == 1
    meta = pq.ParquetFile(files[0]).metadata
    idx = next(
        i for i in range(meta.num_columns)
        if meta.row_group(0).column(i).path_in_schema == "indx"
    )
    ranges = sorted(
        (meta.row_group(g).column(idx).statistics.min,
         meta.row_group(g).column(idx).statistics.max)
        for g in range(meta.num_row_groups)
    )
    assert ranges[0][0] == 0 and ranges[-1][1] == 5000 - 1
    for (_, hi_a), (lo_b, _) in zip(ranges, ranges[1:]):
        assert hi_a < lo_b, "row-group indx ranges must be disjoint"
