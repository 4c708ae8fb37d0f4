"""CLI — the consumer surface the reference's README example wires by
hand (README.md:36-67: flag-parse endpoint/target, open a store, build
the tracker, sync, consume events).

    python -m eth_event_tracker_spark track \
        --endpoint mock:300 --target 0xaaaa... --store ./deposit.store
    python -m eth_event_tracker_spark sql \
        --store ./deposit.store --target 0xaaaa... \
        "SELECT COUNT(*) AS n FROM tracked_logs"
    python -m eth_event_tracker_spark query --list
    python -m eth_event_tracker_spark query --name q1_pricing_summary \
        --sf-dir /root/testdata/sf0.01

``--endpoint mock:N`` synthesizes an N-block deterministic chain (the
sandbox has no node); any ``http(s)://`` endpoint uses the JSON-RPC
provider unchanged.
"""

from __future__ import annotations

import argparse
import json
import sys


def _provider(endpoint: str):
    if endpoint.startswith("mock:"):
        from .sources.mock_chain import MockProvider

        prov = MockProvider()
        prov.advance(int(endpoint.split(":", 1)[1]), logs_per_block=2)
        return prov
    if endpoint.startswith(("http://", "https://")):
        from .sources.rpc_provider import JsonRpcProvider

        return JsonRpcProvider(endpoint)
    raise SystemExit(f"unsupported endpoint {endpoint!r} (mock:N or http[s]://)")


def _config(args) -> "FilterConfig":
    from .config import FilterConfig

    return FilterConfig(
        addresses=tuple(args.target or ()),
        topics=tuple(args.sig or ()),
        start_block=args.start,
        batch_size=args.batch_size,
        max_block_backlog=args.backlog,
    )


def _cmd_track(args) -> int:
    from .store import ParquetStore
    from .streaming import Tracker

    prov = _provider(args.endpoint)
    store = ParquetStore(args.store)
    cfg = _config(args)

    def progress(p: dict) -> None:
        print(
            f"[{p['phase']}] height {p['height']} / target {p['target']}"
            + (" (synced)" if p["synced"] else ""),
            flush=True,
        )

    t = Tracker(prov, store, cfg, on_progress=progress)
    events = t.sync()
    for _ in range(args.poll):
        events += t.poll()
    added = sum(len(e.added) for e in events)
    removed = sum(len(e.removed) for e in events)
    last = t.get_last_block()
    print(
        f"done: filter {cfg.filter_hash[:12]} — {added} adds, {removed} retractions, "
        f"head {last.number if last else '-'} — store at {args.store}"
    )
    return 0


def _cmd_sql(args) -> int:
    from .session import get_spark
    from .sql import register_store_views
    from .store import ParquetStore

    spark = get_spark()
    views = register_store_views(spark, ParquetStore(args.store), _config(args).filter_hash)
    print(f"views: {', '.join(views)}", file=sys.stderr)
    df = spark.sql(args.statement)
    for row in df.limit(args.limit).collect():
        print(json.dumps(row.asDict(), default=str))
    return 0


def _cmd_query(args) -> int:
    from .queries import all_oracles, all_queries

    qs = all_queries()
    if args.list:
        oracles = all_oracles()
        for name in qs:
            print(f"{name}\t{'oracle' if name in oracles else 'rows-only'}")
        return 0
    if not args.name or args.name not in qs:
        raise SystemExit(f"unknown query {args.name!r} (use --list)")
    from .session import get_spark

    spark = get_spark()
    df = qs[args.name](spark, args.sf_dir)
    if args.explain:
        print(
            df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        )
        return 0
    for row in df.limit(args.limit).collect():
        print(json.dumps(row.asDict(), default=str))
    if args.verify:
        oracle = all_oracles().get(args.name)
        if oracle is None:
            print(f"{args.name}: rows-only (no SQL oracle; bounds pinned in pytest)", file=sys.stderr)
            return 0
        import duckdb

        try:
            from tests.oracle_harness import compare  # the driver-gate comparator
        except ImportError as exc:  # running outside the repo root
            raise SystemExit("--verify needs the repo's tests/ package on sys.path") from exc

        con = duckdb.connect()
        con.execute("SET TimeZone='UTC'")
        for t in (
            "region nation customer supplier part orders lineitem events documents embeddings"
        ).split():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
            )
        compare(df, con, oracle, args.name)
        print(f"{args.name}: VERIFIED vs DuckDB oracle at {args.sf_dir}", file=sys.stderr)
    return 0


def _cmd_corpus(args) -> int:
    """Corpus maintenance — the admin surface of the streaming curation
    sink: small-file compaction (incl. the signature sidecar), signature
    backfill after a crash window, and Bloom-log bootstrap for enabling
    the constant-size admission guard on a pre-existing corpus."""
    from .session import get_spark
    from .streaming.curation import compact_corpus, repair_sigs, seed_bloom_log

    spark = get_spark()
    if args.action == "compact":
        n = compact_corpus(spark, args.dir, max_files=args.max_files)
        print(f"compacted {n} partition(s)")
        return 0
    if args.action == "repair-sigs":
        n = repair_sigs(spark, args.dir)
        print(f"backfilled signatures for {n} doc(s)")
        return 0
    if args.action == "seed-bloom":
        if not args.bloom_log:
            raise SystemExit("seed-bloom requires --bloom-log")
        seed_bloom_log(spark, args.dir, args.bloom_log)
        print(f"seeded bloom log at {args.bloom_log}")
        return 0
    raise SystemExit(f"unknown corpus action {args.action!r}")


def _cmd_index(args) -> int:
    """Retrieval-index admin — the inverted text index as a managed
    table: build from a parquet corpus, append new docs, compact the
    per-append small files (shared staged-swap protocol), and query
    BM25 through the index."""
    from .operators.retrieval import (
        append_text_index,
        bm25_query,
        build_text_index,
        compact_text_index,
    )
    from .session import get_spark

    spark = get_spark()
    if args.action in ("build", "append"):
        if not args.corpus:
            raise SystemExit(f"{args.action} requires --corpus")
        docs = spark.read.parquet(args.corpus)
        fn = build_text_index if args.action == "build" else append_text_index
        fn(docs, args.dir, n_buckets=args.buckets)
        print(f"{args.action}: indexed {docs.count()} doc(s) at {args.dir}")
        return 0
    if args.action == "compact":
        n = compact_text_index(spark, args.dir, max_files=args.max_files)
        print(f"compacted {n} partition(s)")
        return 0
    if args.action == "query":
        if not args.terms:
            raise SystemExit("query requires --terms")
        out = bm25_query(
            spark, args.dir, args.terms.split(","), n_buckets=args.buckets,
            top_n=args.limit,
        )
        for row in out.collect():
            print(json.dumps(row.asDict(), default=str))
        return 0
    raise SystemExit(f"unknown index action {args.action!r}")


def _cmd_dq(args) -> int:
    """Data-quality surface — the declarative expectation suite from the
    command line: ``audit`` prints the per-check report for a parquet
    path (exit 1 on any failing check — the CI-gate contract), ``publish``
    runs the full write–audit–publish flow (store/wap.py), ``report``
    prints the evidence a published snapshot carries."""
    from .operators.expectations import run_suite, suite_from_spec
    from .session import get_spark

    if args.action == "report":
        from .store.wap import read_audit

        print(json.dumps(read_audit(args.out), indent=1, sort_keys=True))
        return 0

    if not args.suite:
        raise SystemExit(f"{args.action} requires --suite <spec.json>")
    with open(args.suite) as fh:
        checks = suite_from_spec(json.load(fh))
    spark = get_spark()
    data = spark.read.parquet(args.data)

    if args.action == "audit":
        rows = run_suite(data, checks).collect()
        for row in rows:
            print(json.dumps(row.asDict(), default=str))
        failed = [r["check"] for r in rows if not r["passed"]]
        if failed:
            print(f"FAILED: {', '.join(failed)}", file=sys.stderr)
            return 1
        print(f"ok: {len(rows)} check(s) passed", file=sys.stderr)
        return 0

    if args.action == "publish":
        from .store.wap import AuditFailedError, publish_with_audit

        try:
            audit = publish_with_audit(
                data,
                args.out,
                checks,
                partition_by=args.partition_by.split(",") if args.partition_by else None,
                mode="overwrite" if args.overwrite else "error",
            )
        except AuditFailedError as exc:
            print(str(exc), file=sys.stderr)
            return 1
        print(f"published {args.out}: {len(audit['checks'])} check(s) green")
        return 0
    raise SystemExit(f"unknown dq action {args.action!r}")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="eth_event_tracker_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def filter_flags(p):
        p.add_argument("--target", action="append", help="contract address (repeatable)")
        p.add_argument("--sig", action="append", help="positional topic (repeatable; '' = wildcard)")
        p.add_argument("--start", type=int, default=0)
        p.add_argument("--batch-size", type=int, default=100)
        p.add_argument("--backlog", type=int, default=10)

    tp = sub.add_parser("track", help="sync a filter into a store (reference README main)")
    tp.add_argument("--endpoint", required=True, help="mock:N or http[s]://node")
    tp.add_argument("--store", required=True)
    tp.add_argument("--poll", type=int, default=0, help="head poll cycles after sync")
    filter_flags(tp)
    tp.set_defaults(fn=_cmd_track)

    sp = sub.add_parser("sql", help="SQL over a tracked store (tracked_logs / tracked_changelog)")
    sp.add_argument("--store", required=True)
    sp.add_argument("--limit", type=int, default=20)
    sp.add_argument("statement")
    filter_flags(sp)
    sp.set_defaults(fn=_cmd_sql)

    qp = sub.add_parser("query", help="run a registry query against fixture tables")
    qp.add_argument("--name")
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    qp.add_argument("--limit", type=int, default=20)
    qp.add_argument("--list", action="store_true")
    qp.add_argument("--verify", action="store_true", help="cross-check vs the DuckDB oracle")
    qp.add_argument("--explain", action="store_true", help="print the physical plan instead of rows")
    qp.set_defaults(fn=_cmd_query)

    cp = sub.add_parser("corpus", help="curated-corpus maintenance (compact / repair-sigs / seed-bloom)")
    cp.add_argument("action", choices=["compact", "repair-sigs", "seed-bloom"])
    cp.add_argument("--dir", required=True, help="corpus directory")
    cp.add_argument("--max-files", type=int, default=4)
    cp.add_argument("--bloom-log", help="bloom log directory (seed-bloom)")
    cp.set_defaults(fn=_cmd_corpus)

    ip = sub.add_parser("index", help="inverted-index maintenance (build / append / compact / query)")
    ip.add_argument("action", choices=["build", "append", "compact", "query"])
    ip.add_argument("--dir", required=True, help="index directory")
    ip.add_argument("--corpus", help="parquet corpus path (build/append)")
    ip.add_argument("--buckets", type=int, default=64)
    ip.add_argument("--max-files", type=int, default=4)
    ip.add_argument("--terms", help="comma-separated query terms (query)")
    ip.add_argument("--limit", type=int, default=10)
    ip.set_defaults(fn=_cmd_index)

    dp = sub.add_parser("dq", help="data-quality contract (audit / publish / report)")
    dp.add_argument("action", choices=["audit", "publish", "report"])
    dp.add_argument("--data", help="input parquet path (audit/publish)")
    dp.add_argument("--suite", help="JSON expectation-suite spec (audit/publish)")
    dp.add_argument("--out", help="published snapshot directory (publish/report)")
    dp.add_argument("--partition-by", help="comma-separated partition columns (publish)")
    dp.add_argument("--overwrite", action="store_true", help="replace an existing snapshot")
    dp.set_defaults(fn=_cmd_dq)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
