"""Comparative evidence for operators/skew.salted_join (round-8 verdict
item 7) under a planted hot key — 90% of a ~6M-row wide fact on ONE key,
the zero-address / mega-contract shape of real chain data.

Regime: the dim emulates "too big to broadcast" (threshold -1 — at 100 TB
a contract-metadata dim is tens of GB), so the join MUST shuffle by key
and the hot key lands in one task.  Three variants, AQE ON throughout:

  unmitigated  skewJoin.enabled=false, plain join — the raw hot-task cost
  aqe_skew     skewJoin.enabled=true (defaults)  — Spark's runtime split
               (also plan-asserted in tests/test_skew.py)
  salted       skewJoin.enabled=false, salted_join — the explicit form for
               plans where the runtime split cannot fire (reused/exchange-
               shared shuffles, stream-stream joins, or a skewed partition
               under AQE's 256MB bar that is still 100× its siblings)

Writes skew_evidence.json at the repo root (committed).

    python tools/skew_bench.py [--factor 60] [--dim 300000] [--reps 3]
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
    ap.add_argument("--factor", type=int, default=60, help="events replication")
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
    # emulate the 100 TB regime: dim too big to broadcast
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

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
            # wide payload: the skew cost is ONE task sorting/probing the
            # hot key's bytes — thin rows hide it, real log rows are wide
            F.concat(
                F.sha2(F.col("rid").cast("string"), 256),
                F.sha2((F.col("rid") + 1).cast("string"), 256),
            ).alias("payload"),
        )
        .localCheckpoint()  # pin inputs so every variant times the JOIN
    )
    dim = (
        spark.range(args.dim)
        .select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("meta"),
        )
        .localCheckpoint()
    )
    n_big, n_dim = big.count(), dim.count()

    def run(fn, skew_join: bool) -> list[float]:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_join).lower())
        out = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn().select(F.length("payload").alias("lp"), "value").groupBy().agg(
                F.count("*"), F.sum("value"), F.sum("lp")
            ).collect()
            out.append(round(time.perf_counter() - t0, 2))
        return out

    unmitigated = run(lambda: big.join(dim, "k"), skew_join=False)
    aqe_skew = run(lambda: big.join(dim, "k"), skew_join=True)
    salted = run(lambda: salted_join(big, dim, "k", salt_n=32), skew_join=False)

    # equivalence spot-check (full equality is pinned in tests/test_skew.py)
    a = big.join(dim, "k").groupBy().agg(F.count("*").alias("n"), F.sum("rid").alias("s")).first()
    b = salted_join(big, dim, "k", salt_n=32).groupBy().agg(F.count("*").alias("n"), F.sum("rid").alias("s")).first()
    assert (a.n, a.s) == (b.n, b.s), "salted join result diverged"
    for key, val in saved.items():
        if val is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, val)

    artifact = {
        "source": SRC,
        "rows_big": n_big,
        "rows_dim": n_dim,
        "hot_share": 0.9,
        "salt_n": 32,
        "reps": args.reps,
        "aqe": True,
        "broadcast": "disabled (emulates dim >> threshold)",
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "unmitigated_sec": unmitigated,
        "aqe_skew_sec": aqe_skew,
        "salted_sec": salted,
        "salted_speedup_vs_unmitigated": round(min(unmitigated) / min(salted), 2),
        "aqe_speedup_vs_unmitigated": round(min(unmitigated) / min(aqe_skew), 2),
    }
    with open(os.path.join(ROOT, "skew_evidence.json"), "w") as fh:
        json.dump(artifact, fh, sort_keys=True, indent=1)
    print(json.dumps({
        "unmitigated_best": min(unmitigated),
        "aqe_skew_best": min(aqe_skew),
        "salted_best": min(salted),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
