"""Training-shard export: the materialization sink of the LLM-data
surface — dataloader-ready packed sequences written as hive-partitioned
parquet shards with a validated manifest.

No counterpart in the reference (its sink is the ordered chain store,
store/store.go:24-36); this is the last mile of the curation pipeline:

    curate() → .packed (doc_id, chunk_id, chunk, n_words, shard, seq_id)
             → export_shards(out_dir)  → shard=*/part-*.parquet + _MANIFEST.json
             → read_shards(out_dir)    → manifest-checked DataFrame
             → validate_shards(out_dir) → recount-vs-manifest audit

Scale shape: the data write is ``repartition("shard").write
.partitionBy("shard")`` — one shuffle keyed on the shard id (the same
partitioning the dataloader consumes, so a 100 TB corpus streams
shard-parallel), one file family per shard.  The manifest is a
|shards|-row aggregate collected to the driver — bounded by
construction (``n_shards`` is pipeline config, not data-dependent).

Atomicity: the parquet data commits first (Spark's ``_SUCCESS``), then
the manifest is written to a temp name and ``os.replace``d into place —
a crashed export leaves no ``_MANIFEST.json``, and ``read_shards``
refuses a manifest-less directory rather than serving a torn corpus.
The underscore prefix keeps both markers invisible to Spark's file
listing.

Sibling: :func:`operators.splits.write_training_shards` lays out
DOCUMENT rows in a reproducible shuffled training order (no manifest);
this module is the packed-SEQUENCE sink with the manifest/audit
contract.  A pipeline typically uses one or the other as its last step.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST.json"


def _stats(packed: DataFrame) -> list[dict]:
    rows = (
        packed.groupBy("shard")
        .agg(
            F.count("*").alias("rows"),
            F.sum("n_words").cast("long").alias("words"),
            F.countDistinct("seq_id").alias("n_seqs"),
        )
        .collect()
    )
    return sorted(
        (
            {"shard": int(r["shard"]), "rows": r["rows"], "words": r["words"], "n_seqs": r["n_seqs"]}
            for r in rows
        ),
        key=lambda d: d["shard"],
    )


def export_shards(packed: DataFrame, out_dir: str, mode: str = "error") -> dict:
    """Write packed sequences as ``shard=<k>`` parquet partitions plus an
    atomically-installed ``_MANIFEST.json``; returns the manifest dict.

    ``mode`` is passed to the parquet writer (``error`` refuses an
    existing directory; ``overwrite`` replaces a prior export — its
    stale manifest is removed FIRST so a crash mid-overwrite cannot
    leave an old manifest describing new data)."""
    out = str(out_dir)
    manifest_path = os.path.join(out, MANIFEST)
    if mode == "overwrite" and os.path.exists(manifest_path):
        os.remove(manifest_path)
    (
        packed.repartition("shard")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(out)
    )
    # manifest from the WRITTEN files, not the input lineage: at 100 TB
    # re-evaluating the upstream pipeline for a row count would double
    # the job; one scan of the materialized output is cheaper and
    # describes exactly the corpus on disk.  The explicit schema makes
    # an EMPTY export well-defined too — a schema-less read of a
    # data-free directory raises "Unable to infer schema" (round-7
    # review), while a fully-filtered corpus should export a valid
    # zero-shard manifest.
    back = packed.sparkSession.read.schema(packed.schema).parquet(out)
    per_shard = _stats(back)
    manifest = {
        "n_shards": len(per_shard),
        "total_rows": sum(s["rows"] for s in per_shard),
        "total_words": sum(s["words"] for s in per_shard),
        "total_seqs": sum(s["n_seqs"] for s in per_shard),
        "columns": sorted(c for c in packed.columns),
        "schema_json": packed.schema.json(),
        "shards": per_shard,
    }
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
        fh.write("\n")
    os.replace(tmp, manifest_path)
    return manifest


def read_manifest(out_dir: str) -> dict:
    manifest_path = os.path.join(str(out_dir), MANIFEST)
    if not os.path.exists(manifest_path):
        raise FileNotFoundError(
            f"no {MANIFEST} in {out_dir}: export incomplete or crashed — "
            "refusing to serve a torn corpus"
        )
    with open(manifest_path) as fh:
        return json.load(fh)


def read_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    """Manifest-checked read of an exported corpus.  The hive ``shard``
    partition column comes back as a partition value, so filters like
    ``WHERE shard = 7`` prune to one directory (partition pruning — the
    dataloader's per-worker read path).  The manifest's recorded schema
    drives the read, so an empty corpus round-trips with its columns
    intact instead of failing schema inference."""
    from pyspark.sql.types import StructType

    manifest = read_manifest(out_dir)  # presence = export completed
    reader = spark.read
    if "schema_json" in manifest:
        reader = reader.schema(StructType.fromJson(json.loads(manifest["schema_json"])))
    return reader.parquet(str(out_dir))


def validate_shards(spark: SparkSession, out_dir: str) -> dict:
    """Recount the exported files against the manifest: per-shard rows /
    words / sequence counts and the column set.  Returns
    ``{"ok": bool, "problems": [...]}`` — the audit a training job runs
    before trusting a corpus handed to it."""
    manifest = read_manifest(out_dir)
    df = read_shards(spark, out_dir)
    problems: list[str] = []
    if sorted(df.columns) != manifest["columns"]:
        problems.append(f"columns {sorted(df.columns)} != manifest {manifest['columns']}")
    actual = {s["shard"]: s for s in _stats(df)}
    expected = {s["shard"]: s for s in manifest["shards"]}
    for k in sorted(set(actual) | set(expected)):
        if k not in actual:
            problems.append(f"shard {k}: in manifest but missing on disk")
        elif k not in expected:
            problems.append(f"shard {k}: on disk but not in manifest")
        elif actual[k] != expected[k]:
            problems.append(f"shard {k}: {expected[k]} -> {actual[k]}")
    return {"ok": not problems, "problems": problems}
