"""Write–Audit–Publish (store/wap.py): a reader can never observe a
snapshot that failed its data contract.  Pins: green publish + evidence
file, red quarantine + raise, overwrite swap, every constructed crash
window (marked stage roll-forward, unmarked stage discard, old-dir
roll-back, stray marker cleanup), and the unaudited-read refusal."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from eth_event_tracker_spark.operators import expectations as X
from eth_event_tracker_spark.store import wap


def _df(spark, n=10, bad=False):
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") * 10.0).alias("price"),
        F.concat(F.lit("AA"), F.lit("")).alias("code"),
    )
    if bad:
        df = df.withColumn(
            "price", F.when(F.col("id") == 3, F.lit(-1.0)).otherwise(F.col("price"))
        )
    return df


def _checks():
    return [
        X.row_count(lo=1),
        X.completeness("id", 1.0),
        X.in_range("price", 0, 1e9, 1.0),
    ]


def test_green_publish_and_evidence(spark, tmp_path):
    out = str(tmp_path / "snap")
    audit = wap.publish_with_audit(_df(spark), out, _checks())
    assert audit["ok"] and os.path.isdir(out)
    # the evidence travels with the data
    on_disk = wap.read_audit(out)
    assert on_disk["ok"] and len(on_disk["checks"]) == 3
    assert all(c["passed"] for c in on_disk["checks"])
    assert wap.read_published(spark, out).count() == 10
    # no stage/old/reject leftovers
    assert os.listdir(tmp_path) == ["snap"]


def test_red_audit_quarantines_and_raises(spark, tmp_path):
    out = str(tmp_path / "snap")
    with pytest.raises(wap.AuditFailedError) as ei:
        wap.publish_with_audit(_df(spark, bad=True), out, _checks())
    assert not os.path.exists(out), "a failing snapshot must never publish"
    q = ei.value.quarantine
    assert os.path.isdir(q) and "__rejected_" in q
    rep = json.load(open(os.path.join(q, wap.AUDIT)))
    assert not rep["ok"]
    failing = [c["check"] for c in rep["checks"] if not c["passed"]]
    assert failing == ["in_range(price)"]
    assert ei.value.failures[0]["check"] == "in_range(price)"
    with pytest.raises(FileNotFoundError, match="unaudited"):
        wap.read_published(spark, out)


def test_overwrite_swaps_atomically(spark, tmp_path):
    out = str(tmp_path / "snap")
    wap.publish_with_audit(_df(spark, n=5), out, _checks())
    with pytest.raises(FileExistsError):
        wap.publish_with_audit(_df(spark, n=7), out, _checks())
    wap.publish_with_audit(_df(spark, n=7), out, _checks(), mode="overwrite")
    assert wap.read_published(spark, out).count() == 7
    assert os.listdir(tmp_path) == ["snap"]
    # a failing overwrite leaves the old snapshot untouched
    with pytest.raises(wap.AuditFailedError):
        wap.publish_with_audit(_df(spark, bad=True), out, _checks(), mode="overwrite")
    assert wap.read_published(spark, out).count() == 7


class TestCrashWindows:
    def test_marked_stage_rolls_forward(self, spark, tmp_path):
        out = str(tmp_path / "snap")
        wap.publish_with_audit(_df(spark, n=5), out, _checks())
        # construct: overwrite crashed between rename(out, old) and
        # rename(stage, out) — stage carries _COMMIT, out is gone
        stage, old = out + wap._STAGE_SFX + "t1", out + wap._OLD_SFX + "t1"
        os.rename(out, stage)
        open(os.path.join(stage, wap._COMMIT), "w").close()
        shutil.copytree(stage, old)
        wap._recover(out)
        assert os.path.isdir(out) and not os.path.exists(stage)
        assert not os.path.exists(old)
        assert wap.read_published(spark, out).count() == 5

    def test_unmarked_stage_is_discarded(self, spark, tmp_path):
        out = str(tmp_path / "snap")
        wap.publish_with_audit(_df(spark, n=5), out, _checks())
        stale = out + wap._STAGE_SFX + "dead"
        os.makedirs(stale)
        wap._recover(out)
        assert not os.path.exists(stale) and os.path.isdir(out)

    def test_old_dir_rolls_back(self, spark, tmp_path):
        out = str(tmp_path / "snap")
        wap.publish_with_audit(_df(spark, n=5), out, _checks())
        old = out + wap._OLD_SFX + "t2"
        os.rename(out, old)  # crash right after rename(out, old)
        wap._recover(out)
        assert os.path.isdir(out) and not os.path.exists(old)
        assert wap.read_published(spark, out).count() == 5

    def test_stray_marker_cleaned(self, spark, tmp_path):
        out = str(tmp_path / "snap")
        wap.publish_with_audit(_df(spark, n=5), out, _checks())
        open(os.path.join(out, wap._COMMIT), "w").close()
        wap._recover(out)
        assert not os.path.exists(os.path.join(out, wap._COMMIT))

    def test_next_publish_runs_recovery(self, spark, tmp_path):
        out = str(tmp_path / "snap")
        old = out + wap._OLD_SFX + "t3"
        wap.publish_with_audit(_df(spark, n=5), out, _checks())
        os.rename(out, old)
        # entry point recovers (rolls back), then overwrites cleanly
        wap.publish_with_audit(_df(spark, n=9), out, _checks(), mode="overwrite")
        assert wap.read_published(spark, out).count() == 9
        assert os.listdir(tmp_path) == ["snap"]


def test_partitioned_publish_prunes(spark, tmp_path):
    out = str(tmp_path / "snap")
    df = _df(spark, n=20).withColumn("bucket", (F.col("id") % 4).cast("int"))
    wap.publish_with_audit(df, out, _checks(), partition_by=["bucket"])
    got = wap.read_published(spark, out).where(F.col("bucket") == 2)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert got.count() == 5
    assert "PartitionFilters: [isnotnull(bucket" in plan
