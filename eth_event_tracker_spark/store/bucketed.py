"""Bucketed-table co-location: the 100 TB join strategy the reference
never needs (single node) but a 1000-executor deployment lives on.

Writing both sides of a recurring join bucketed by the join key
(`df.write.bucketBy(n, key).sortBy(key)`) persists the shuffle once:
every later join between the two tables is planned WITHOUT an Exchange —
each executor joins bucket i against bucket i locally.  For the tracker
workload this fits the logs ⋈ blocks enrichment (`chain.py`
`logs_block_enrich`) keyed by block_num: both tables are append-only and
written by the same job, so their bucketing stays aligned forever.

Spark bucketing requires a session catalog (`saveAsTable`); the in-memory
catalog + a local warehouse dir is enough — no Hive metastore needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist df as a parquet table bucketed AND sorted by `key`.

    `sortBy` matters: with one file per bucket the join also skips its
    Sort, leaving a pure zip of pre-sorted buckets.  Pass `path` to make
    it an external table (data outside the warehouse dir)."""
    w = (
        df.repartition(n_buckets, key)  # one file per bucket, keeps sortBy effective
        .write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .mode(mode)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key — planned
    with zero Exchange when both sides were written by `write_bucketed`
    with the same n_buckets."""
    return spark.table(left_table).join(spark.table(right_table), key)
