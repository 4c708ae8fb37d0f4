"""Comparative evidence for operators/skew.salted_join (round-8 verdict
item 7): under a planted hot key — 90% of a ~2M-row fact on ONE key, the
zero-address / mega-contract shape of real chain data — time the naive
shuffle join against the salted join, AQE ON, with a dim sized past the
broadcast threshold (the regime where salting matters: small dims
broadcast, huge dims SMJ-split under AQE's 256MB skew bar, but a
medium dim with a hot probe side lands every hot row in one task).

Writes skew_evidence.json at the repo root (committed):
  {"rows_big": ..., "rows_dim": ..., "hot_share": 0.9,
   "naive_sec": [...], "salted_sec": [...], "speedup_best": ...}

    python tools/skew_bench.py [--factor 20] [--dim 300000] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=20, help="events replication")
    ap.add_argument("--dim", type=int, default=300_000, help="dim rows")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from eth_event_tracker_spark.operators.skew import salted_join
    from eth_event_tracker_spark.session import get_spark
    from eth_event_tracker_spark.tables import load_table

    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"

    ev = load_table(spark, SRC, "events").select("event_id", "value")
    big = (
        ev.withColumn("_i", F.explode(F.array(*[F.lit(i) for i in range(args.factor)])))
        .select(
            (F.col("event_id") * args.factor + F.col("_i")).alias("rid"),
            F.col("value"),
        )
        # 90% of rows on key 0, the rest spread over the dim's key space
        .select(
            F.when(F.col("rid") % 10 < 9, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("rid"), F.lit(args.dim)))
            .alias("k"),
            "value",
            "rid",
        )
        .localCheckpoint()  # pin inputs so both variants time the JOIN
    )
    dim = (
        spark.range(args.dim)
        .select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("meta"),  # >10MB total
        )
        .localCheckpoint()
    )
    n_big, n_dim = big.count(), dim.count()

    def run(fn) -> list[float]:
        out = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn().groupBy().agg(F.count("*"), F.sum("value")).collect()
            out.append(round(time.perf_counter() - t0, 2))
        return out

    naive = run(lambda: big.join(dim, "k"))
    salted = run(lambda: salted_join(big, dim, "k", salt_n=16))
    # equivalence spot-check (full equality is pinned in tests/test_skew.py)
    a = big.join(dim, "k").groupBy().agg(F.count("*").alias("n"), F.sum("rid").alias("s")).first()
    b = salted_join(big, dim, "k", salt_n=16).groupBy().agg(F.count("*").alias("n"), F.sum("rid").alias("s")).first()
    assert (a.n, a.s) == (b.n, b.s), "salted join result diverged"

    artifact = {
        "source": SRC,
        "rows_big": n_big,
        "rows_dim": n_dim,
        "hot_share": 0.9,
        "salt_n": 16,
        "reps": args.reps,
        "aqe": True,
        "broadcast_threshold": spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "naive_sec": naive,
        "salted_sec": salted,
        "speedup_best": round(min(naive) / min(salted), 2),
    }
    with open(os.path.join(ROOT, "skew_evidence.json"), "w") as fh:
        json.dump(artifact, fh, sort_keys=True, indent=1)
    print(json.dumps({"naive_best": min(naive), "salted_best": min(salted),
                      "speedup": artifact["speedup_best"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
