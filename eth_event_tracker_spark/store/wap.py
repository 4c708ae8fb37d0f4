"""Write–Audit–Publish: the staged publication pattern for curated
snapshots — data is written to a STAGE directory, the declarative
expectation suite (operators/expectations.py) audits the MATERIALIZED
files, and only a fully-passing audit is atomically renamed into the
published location.  A failing audit quarantines the stage (data +
report kept for inspection) and raises; a reader can NEVER observe a
snapshot that did not pass its data contract.

This is the lakehouse WAP discipline (popularized by Netflix on
Iceberg) re-expressed over plain parquet directories with the repo's
staged-swap conventions (streaming/sketch.py, store/filecompact.py):

* **Audit the files, not the lineage.**  The suite runs over a read of
  the staged output — what was actually written, after every upstream
  transform, shuffle, and writer quirk.  Cost at 100 TB: one extra scan
  of the snapshot (the suite is a single aggregate pass), not a re-run
  of the producing pipeline.
* **Publish is one atomic rename.**  POSIX rename here; on a DFS the
  same seam is the atomic-rename/commit API.  ``overwrite`` of an
  existing snapshot stages a ``_COMMIT`` marker first and swaps via
  two renames; the crash window between them is closed by
  ``_recover`` (runs at every entry point): a ``_COMMIT``-marked stage
  rolls FORWARD, an orphaned old dir rolls back, anything unmarked and
  stale is a crashed write — discarded.
* **Evidence travels with the data.**  The audit report (per-check
  metric, bounds, verdict) is written into the stage as ``_AUDIT.json``
  BEFORE the rename, so every published snapshot carries the proof it
  passed, and every quarantined one carries the proof it failed.

The reference repo has no audit tier; its closest relative is the
pre-sync fingerprint validation (`tracker.go:402-444`) — a hand-rolled,
imperative contract.  This module is the declarative generalization.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

AUDIT = "_AUDIT.json"
_COMMIT = "_COMMIT"
_STAGE_SFX = ".__stage_"
_OLD_SFX = ".__old_"
_REJECT_SFX = ".__rejected_"


class AuditFailedError(RuntimeError):
    def __init__(self, out_dir: str, quarantine: str, failures: list[dict]):
        self.quarantine = quarantine
        self.failures = failures
        names = ", ".join(f["check"] for f in failures)
        super().__init__(
            f"audit failed for {out_dir}: [{names}] — data + report "
            f"quarantined at {quarantine}"
        )


def _siblings(out: str, sfx: str) -> list[str]:
    parent, base = os.path.dirname(out) or ".", os.path.basename(out)
    if not os.path.isdir(parent):
        return []
    return sorted(
        os.path.join(parent, d)
        for d in os.listdir(parent)
        if d.startswith(base + sfx)
    )


def _recover(out: str) -> None:
    """Close the overwrite crash windows (see module docstring)."""
    for stage in _siblings(out, _STAGE_SFX):
        if os.path.exists(os.path.join(stage, _COMMIT)):
            if not os.path.exists(out):
                os.remove(os.path.join(stage, _COMMIT))
                os.rename(stage, out)  # roll forward
            else:
                # both present: either the swap completed (out = the new
                # snapshot, stage is a leftover) or it never started
                # (out = the old snapshot — the caller saw a crash, not
                # a success).  Both are consistent; drop the stage.
                shutil.rmtree(stage)
        else:
            shutil.rmtree(stage)  # crashed mid-write — never audited
    for old in _siblings(out, _OLD_SFX):
        if not os.path.exists(out):
            os.rename(old, out)  # roll back: the new snapshot never landed
        else:
            shutil.rmtree(old)
    # crash between the publish rename and marker removal: out is live
    # and complete, only the stray marker remains
    marker = os.path.join(out, _COMMIT)
    if os.path.exists(marker):
        os.remove(marker)


def publish_with_audit(
    df: DataFrame,
    out_dir: str,
    checks,
    partition_by: list[str] | None = None,
    mode: str = "error",
) -> dict:
    """Stage ``df`` as parquet, audit the staged FILES against
    ``checks``, and atomically publish on a fully-green report.

    Returns the audit dict ``{"ok", "checks": [...]}`` on success;
    raises :class:`AuditFailedError` (stage renamed to a quarantine
    directory, report inside) on any failing check.  ``mode="error"``
    refuses an existing snapshot; ``mode="overwrite"`` swaps it out
    atomically with crash recovery."""
    from ..operators.expectations import run_suite

    out = str(out_dir)
    _recover(out)
    if os.path.exists(out) and mode != "overwrite":
        raise FileExistsError(f"{out} exists (mode='error')")
    token = uuid.uuid4().hex[:12]
    stage = f"{out}{_STAGE_SFX}{token}"

    writer = df.write.mode("error")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(stage)

    staged = df.sparkSession.read.schema(df.schema).parquet(stage)
    report = [r.asDict() for r in run_suite(staged, checks).collect()]
    audit = {
        "ok": all(r["passed"] for r in report),
        "checks": report,
        "schema_json": df.schema.json(),
        "partition_by": partition_by or [],
    }
    tmp = os.path.join(stage, AUDIT + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(audit, fh, indent=1, sort_keys=True, default=str)
        fh.write("\n")
    os.replace(tmp, os.path.join(stage, AUDIT))

    if not audit["ok"]:
        quarantine = f"{out}{_REJECT_SFX}{token}"
        os.rename(stage, quarantine)
        raise AuditFailedError(
            out, quarantine, [r for r in report if not r["passed"]]
        )

    if os.path.exists(out):  # overwrite: marked-commit two-rename swap
        open(os.path.join(stage, _COMMIT), "w").close()
        old = f"{out}{_OLD_SFX}{token}"
        os.rename(out, old)
        os.rename(stage, out)
        # marker removed only AFTER the new snapshot is in place — a
        # crash at any earlier point leaves either a _COMMIT-marked
        # stage (rolled forward) or the old dir (rolled back), never a
        # discarded audited snapshot
        os.remove(os.path.join(out, _COMMIT))
        shutil.rmtree(old)
    else:
        os.rename(stage, out)
    return audit


def read_audit(out_dir: str) -> dict:
    path = os.path.join(str(out_dir), AUDIT)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no {AUDIT} in {out_dir}: not published through the audit "
            "gate — refusing to serve an unaudited snapshot"
        )
    with open(path) as fh:
        return json.load(fh)


def read_published(spark: SparkSession, out_dir: str) -> DataFrame:
    """Audit-checked read: presence of a green ``_AUDIT.json`` is the
    publication marker (a quarantined stage carries a red one and never
    sits at the published path)."""
    from pyspark.sql.types import StructType

    audit = read_audit(out_dir)
    assert audit["ok"], f"{out_dir} carries a failing audit — corrupt publish"
    reader = spark.read
    if "schema_json" in audit:
        reader = reader.schema(StructType.fromJson(json.loads(audit["schema_json"])))
    return reader.parquet(str(out_dir))
