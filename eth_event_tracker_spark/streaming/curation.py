"""Incremental corpus curation: the batch curation stages running as a
Structured Streaming ingest — the shape a crawl pipeline has in
production, where documents arrive continuously and the curated corpus
is an append-only table.

Per micro-batch (``foreachBatch``):

  1. quality gate + PII redaction       (stateless projections)
  2. within-batch exact dedup           (keep min doc_id per content hash)
  3. cross-batch exact dedup            (anti-join against the corpus)
  4. append survivors                   (partitioned by hash prefix)

The cross-batch state is the corpus ITSELF — no sidecar index to keep
transactionally in sync. The corpus is laid out
``hash_prefix=XX/part-*.parquet`` (prefix = first 2 hex chars of the
content hash, 256 uniform partitions), so the guard read is doubly
bounded:

  - **partition pruning**: a micro-batch touches ≤256 prefixes, and the
    read lists only those directories (usually far fewer for small
    batches);
  - **column pruning**: only ``content_hash`` is decoded — the guard
    reads the 32-byte hash column of the pruned partitions, never
    document text.

At 100 TB of text that makes the per-batch guard O(hash column of the
touched prefixes), the same bounded-replay-guard discipline as the log
entry's ``dedup_against_tail`` (streaming/pipeline.py).

Exactly-once: the anti-join makes appends idempotent — a replayed batch
finds its own hashes already in the corpus and appends nothing. (The
reference's tracker gets the same property from its checkpoint commit
order, tracker.go:369-382; content-addressed data lets us get it from
the data itself.)

Near-dup clustering stays a periodic BATCH sweep (curation.curate) over
the accumulated corpus — LSH banding needs global signatures, which is
exactly what a streaming pass cannot see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import text as OPT


def curate_batch(batch_df: DataFrame) -> DataFrame:
    """Stateless front half: gate → redact → within-batch exact dedup.
    Returns surviving rows with (content_hash, hash_prefix) attached."""
    verdicts = OPT.quality_verdicts(batch_df)
    kept = batch_df.join(
        verdicts.where(F.col("verdict") == "keep").select("doc_id"), "doc_id", "left_semi"
    )
    red = (
        OPT.redact_pii(kept)
        .drop("text", "n_email", "n_phone", "n_ipv4")
        .withColumnRenamed("redacted", "text")
    )
    # the "p" guard keeps the partition VALUE non-numeric: hive-style
    # partition directories round-trip through type inference, and a
    # run of all-digit prefixes would come back as ints — silently
    # type-mismatching (and so defeating) the cross-batch anti-join
    hashed = red.withColumn(
        "content_hash", F.sha2(OPT.normalize(F.col("text")), 256)
    ).withColumn("hash_prefix", F.concat(F.lit("p"), F.substring("content_hash", 1, 2)))
    # within-batch dedup: deterministic winner (min doc_id) per hash
    w_min = F.min("doc_id").over(Window.partitionBy("content_hash"))
    return (
        hashed.withColumn("_min_id", w_min)
        .where(F.col("doc_id") == F.col("_min_id"))
        .drop("_min_id")
    )


def _corpus_exists(spark: SparkSession, corpus_dir: str) -> bool:
    """Hadoop-FS existence probe for the corpus root — works for any
    filesystem Spark can address (local, HDFS, object store), unlike an
    os.path check."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(corpus_dir)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(path))


def append_curated(spark: SparkSession, corpus_dir: str, batch_df: DataFrame) -> None:
    """Cross-batch guard + append: drop rows whose content hash already
    lives in the corpus (prefix-pruned, hash-column-only read), then
    append the survivors partitioned by hash prefix.

    The guard FAILS LOUD: only a genuinely absent corpus directory (the
    first batch) skips the anti-join.  Any read failure on an existing
    corpus — corrupt footer, permission error, transient FS fault —
    propagates, failing the micro-batch so the stream retries, instead of
    silently degrading to no-dedup and appending duplicates (which would
    break the exactly-once guarantee with no error surfaced)."""
    cur = curate_batch(batch_df)
    prefixes = [r.hash_prefix for r in cur.select("hash_prefix").distinct().collect()]
    if not prefixes:
        return
    if _corpus_exists(spark, corpus_dir):
        # explicit schema: no footer-based inference, so an existing-but-
        # empty corpus reads as zero rows rather than erroring, while a
        # corrupt data file still fails at scan time (loud, as intended)
        existing = (
            spark.read.schema("content_hash string, hash_prefix string")
            .parquet(corpus_dir)
            .where(F.col("hash_prefix").isin(prefixes))
            .select("hash_prefix", "content_hash")
        )
        cur = cur.join(existing, ["hash_prefix", "content_hash"], "left_anti")
    (
        cur.write.mode("append")
        .partitionBy("hash_prefix")
        .parquet(corpus_dir)
    )


def start_corpus_ingest(
    spark: SparkSession,
    input_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string, lang string, source string",
    available_now: bool = False,
):
    """Streaming query: parquet file drops in ``input_dir`` → curated
    append-only corpus in ``corpus_dir``."""
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        append_curated(spark, corpus_dir, batch_df)

    writer = stream.writeStream.foreachBatch(ingest).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def corpus_view(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """The curated corpus as a DataFrame."""
    return spark.read.parquet(corpus_dir)
