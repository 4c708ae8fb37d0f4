"""Per-query profiler: run one registry entry under the bench session
shape (get_spark, $SPARK_GRAFT_SF_DIR, GRAPH_COLD like bench.py) and
report wall time, job/stage counts from the status tracker, and the
formatted physical plan — the guide-§1 measurement loop in one command.

    python tools/profile_query.py <entry> [n_runs] [--plan-out FILE]

Times the same action as bench.py (``.count()``) so numbers are
comparable, then separately times a noop-sink write (guide §1.4) so the
column-pruned count and the every-column materialization can be told
apart.  Stage/job counts come from the JVM status store via the REST-less
StatusTracker, diffed across the run.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    n_runs = int(args[1]) if len(args) > 1 else 2
    plan_out = None
    for a in sys.argv[1:]:
        if a.startswith("--plan-out="):
            plan_out = a.split("=", 1)[1]

    os.environ.setdefault("SPARK_GRAFT_GRAPH_COLD", "1")  # bench parity
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from eth_event_tracker_spark.queries import REGISTRY, _load
    from eth_event_tracker_spark.session import get_spark

    _load()
    q = REGISTRY[name]
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    # warm like bench.py
    spark.range(1000).count()
    from eth_event_tracker_spark.queries.llmdata import _doc_shingles
    from eth_event_tracker_spark.tables import derived_logs

    derived_logs(spark, sf_dir).count()
    _doc_shingles(spark, sf_dir).count()

    tracker = sc.statusTracker()

    def job_ids():
        return set(tracker.getJobIdsForGroup(None) or [])

    for i in range(n_runs):
        before = job_ids()
        sc.setJobDescription(f"profile:{name}:run{i}")
        t0 = time.perf_counter()
        n = q.fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        new_jobs = sorted(job_ids() - before)
        n_stages = 0
        n_tasks = 0
        for j in new_jobs:
            info = tracker.getJobInfo(j)
            if info:
                for s in info.stageIds:
                    si = tracker.getStageInfo(s)
                    if si:
                        n_stages += 1
                        n_tasks += si.numTasks
        print(
            f"RUN {i}: {dt:.3f}s rows={n} jobs={len(new_jobs)} "
            f"stages={n_stages} tasks={n_tasks}"
        )

    # noop-sink timing (every column materialized, no count-pruning)
    t0 = time.perf_counter()
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(f"NOOP: {time.perf_counter() - t0:.3f}s")

    plan = q.fn(spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
        q.fn(spark, sf_dir)._jdf.queryExecution(), "formatted"
    )
    if plan_out:
        Path(plan_out).parent.mkdir(parents=True, exist_ok=True)
        Path(plan_out).write_text(plan)
        print(f"plan -> {plan_out}")
    else:
        print(plan)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
