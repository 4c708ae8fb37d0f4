"""sf1.0 smoke tier for the heaviest queries (round-7 verdict item 4).

The sf0.1 gate has caught two real bugs sf0.01 missed; the iterative
graph/ML queries and the dedup joins had never seen another 10×.  This
tool synthesizes an sf≈1.0 dataset (≈6M-row lineitem) by replicating the
sf0.1 fixtures ``factor`` times with disjoint key ranges — referential
integrity preserved (every fk column shifts by the same per-replica
stride), dims (region, nation) unchanged — then runs the N heaviest
registry queries (by the committed bench_full.json best times) under a
per-query runtime budget, recording rows + seconds to ``sf1_smoke.json``
at the repo root (committed evidence).

Row counts at sf1 are NOT oracle-graded (DuckDB over 6M-row synthetic
replicas would double the runtime for no new correctness signal — the
same plans are hash-checked at sf0.1); the tier exists to surface
DENSITY bugs: quadratic candidate blowups, driver collects that stop
being k-bounded, RANGE frames over 10× rows per key, skew that AQE
must split.  A query exceeding its budget or erroring fails the run.

    python tools/sf1_smoke.py                  # build (if absent) + run
    python tools/sf1_smoke.py --rebuild        # force re-synthesize
    python tools/sf1_smoke.py --top 15 --budget 120

The synthetic dataset lives under /tmp/eets_sf1_synth (regenerable,
never committed).  Duplicated document text across replicas is
deliberate: a 10-way exact-duplicate corpus is exactly the shape a
crawl-scale dedup pass must absorb without a pair blowup (clusters of
10 → 45 pairs per group, linear in corpus size).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SRC = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/eets_sf1_synth")
STRIDE = 1_000_000_000  # > any sf0.1 key; replica i shifts keys by i*STRIDE

# fk-consistent key columns per table; dims replicate unchanged
KEY_COLS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build_sf1(spark, factor: int = 10) -> None:
    from pyspark.sql import functions as F

    for name, keys in KEY_COLS.items():
        src = spark.read.parquet(f"{SRC}/{name}.parquet")
        if not keys:
            out = src
        else:
            # one scan, exploded replica index — not a 10-way union of
            # 10 scans (the same single-pass shape a real scale-up job
            # would run over 100 TB of source)
            rep = src.select(
                F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("_rep"), "*"
            )
            out = rep.select(
                *[
                    (
                        F.col(c).cast("long")
                        + F.col("_rep").cast("long") * F.lit(STRIDE).cast("long")
                    ).alias(c)
                    if c in keys
                    else F.col(c)
                    for c in src.columns
                ]
            )
        out.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
        print(f"# built {name} x{1 if not keys else factor}", file=sys.stderr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=15, help="N heaviest queries to run")
    ap.add_argument("--budget", type=float, default=150.0, help="per-query budget (s)")
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--only", nargs="*", default=None,
                    help="run exactly these queries instead of the N heaviest")
    ap.add_argument("--out", default="sf1_smoke.json",
                    help="artifact filename at the repo root")
    ap.add_argument("--dst", default=None,
                    help="override the synth dataset dir (default $SPARK_GRAFT_SF1_DIR)")
    args = ap.parse_args()
    global DST
    if args.dst:
        DST = args.dst

    # the 100x synthetic tier needs a bigger single-JVM heap than the 8g
    # local-mode default: at factor 100 the co-supply extraction OOM'd
    # at 8g while completing comfortably at 48g — a deployment sizes
    # executor memory in its submit conf, so the smoke sizes its local
    # stand-in the same way (explicit SPARK_GRAFT_DRIVER_MEM still
    # wins).  Do NOT oversize smaller tiers: an idle-host A/B at sf3
    # measured the LPA loop 50% SLOWER under a 48g heap than 8g
    # (60.5 s vs 90.3 s — GC profile), so the bump applies only where
    # 8g actually fails.
    if args.factor > 30:
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from eth_event_tracker_spark.queries import REGISTRY, _load
    from eth_event_tracker_spark.session import get_spark

    _load()
    spark = get_spark("sf1-smoke")
    spark.sparkContext.setLogLevel("WARN")

    if args.rebuild or not os.path.isdir(f"{DST}/lineitem.parquet"):
        t0 = time.perf_counter()
        build_sf1(spark, args.factor)
        print(f"# synth build: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    if args.only:
        heaviest = [n for n in args.only if n in REGISTRY]
        assert len(heaviest) == len(args.only), "unknown query in --only"
    else:
        with open(os.path.join(ROOT, "bench_full.json")) as fh:
            best = json.load(fh)["best"]
        heaviest = [
            n for n in sorted(best, key=best.get, reverse=True) if n in REGISTRY
        ][: args.top]

    results: dict[str, dict] = {}
    ok = True
    for name in heaviest:
        t0 = time.perf_counter()
        try:
            n_rows = REGISTRY[name].fn(spark, DST).count()
            sec = round(time.perf_counter() - t0, 2)
            status = "ok" if sec <= args.budget else "over_budget"
            results[name] = {"status": status, "rows": n_rows, "sec": sec}
        except Exception as e:  # noqa: BLE001 — smoke harness records, then fails
            sec = round(time.perf_counter() - t0, 2)
            results[name] = {"status": "error", "error": str(e)[:300], "sec": sec}
            status = "error"
        ok = ok and status == "ok"
        print(f"# {name}: {results[name]}", file=sys.stderr)

    artifact = {
        "sf": round(0.1 * args.factor, 3),
        "factor": args.factor,
        "source": SRC,
        "budget_sec": args.budget,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "queries": results,
    }
    with open(os.path.join(ROOT, args.out), "w") as fh:
        json.dump(artifact, fh, sort_keys=True, indent=1)
    print(json.dumps({args.out.removesuffix(".json"): "ok" if ok else "FAIL", "n": len(results)}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
