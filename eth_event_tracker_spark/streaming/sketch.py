"""Streaming frequency sketching: the count-min sketch as cross-batch
state, stored as a LOG of per-batch partial sketches.

The CMS's partial-aggregate property (operators/sketches.py) makes the
exactly-once story trivial: each micro-batch writes its OWN d×w partial
under ``<path>/parts/batch=<id>`` — no read-modify-write of shared
state, so a replayed batch is detected by its directory existing and
skipped (idempotent), and a crash between write and checkpoint commit
just re-runs an overwrite of identical content.  Query-time
``read_sketch`` merges the log with one groupBy — bounded by
d·w·n_batches rows regardless of stream volume — and ``compact_sketch``
folds the log back to a single partial whenever n_batches grows."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import cms_build


def start_sketch_ingest(
    spark: SparkSession,
    input_dir: str,
    key_col: str,
    path: str,
    checkpoint_dir: str,
    schema: str,
    d: int = 4,
    w: int = 1024,
    available_now: bool = False,
):
    """File-stream → per-batch partial CMS appends."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        part_dir = f"{path}/parts/batch={batch_id}"
        if os.path.exists(part_dir):  # checkpoint replay → already durable
            return
        cms_build(batch_df, key_col, d=d, w=w).write.mode("overwrite").parquet(part_dir)

    reader = spark.readStream.schema(schema).parquet(input_dir)
    writer = reader.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_sketch(spark: SparkSession, path: str) -> DataFrame:
    """The merged sketch: one groupBy over the partial log."""
    parts = spark.read.parquet(f"{path}/parts")
    return parts.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def compact_sketch(spark: SparkSession, path: str) -> None:
    """Fold the partial log into one part (cell-wise sums are
    associative, so the merged sketch is unchanged — asserted in tests).
    Staged write + atomic swap, same discipline as the parquet store's
    changelog compaction."""
    import shutil

    merged = read_sketch(spark, path)
    stage = f"{path}/_stage_parts"
    merged.coalesce(1).write.mode("overwrite").parquet(f"{stage}/batch=-1")
    old = f"{path}/parts"
    tmp_old = f"{path}/_old_parts"
    os.rename(old, tmp_old)
    os.rename(stage, old)
    shutil.rmtree(tmp_old)
