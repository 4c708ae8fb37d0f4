"""CLI surface: the reference README's flag-parsed main as subcommands."""

from __future__ import annotations

import json

from eth_event_tracker_spark.__main__ import main


def test_cli_track_then_sql(tmp_path, capsys, spark):
    store = str(tmp_path / "clistore")
    rc = main(["track", "--endpoint", "mock:30", "--store", store, "--poll", "1"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "done: filter" in out and "60 adds" in out

    rc = main(
        ["sql", "--store", store, "--limit", "5",
         "SELECT COUNT(*) AS n, MAX(block_num) AS head FROM tracked_logs"]
    )
    assert rc == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row == {"n": 60, "head": 30}


def test_cli_query_list_and_run(capsys, spark):
    assert main(["query", "--list"]) == 0
    names = capsys.readouterr().out.split()
    assert "q1_pricing_summary" in names and len(names) >= 70

    assert main(["query", "--name", "sort_limit_topk", "--limit", "3"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 3
    json.loads(lines[0])


def test_cli_query_verify(capsys, spark):
    assert main(["query", "--name", "kv_prefix_scan", "--verify", "--limit", "1"]) == 0
    err = capsys.readouterr().err
    assert "VERIFIED vs DuckDB oracle" in err

    # rows-only entries report their pytest-pinned status instead
    assert main(["query", "--name", "approx_distinct_parts", "--verify", "--limit", "1"]) == 0
    assert "rows-only" in capsys.readouterr().err


def test_cli_query_explain(capsys, spark):
    assert main(["query", "--name", "q5_local_supplier_volume", "--explain"]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "BroadcastHashJoin" in out


def test_cli_corpus_maintenance(tmp_path, capsys, spark):
    from eth_event_tracker_spark.__main__ import main
    from eth_event_tracker_spark.streaming.curation import append_curated, corpus_view

    corpus = tmp_path / "c"
    text = "spark row batch " * 12
    for b in range(3):
        batch = spark.createDataFrame(
            [(10 * b + i, text + f"cli {b} {i}", "en", "s0") for i in range(4)],
            "doc_id long, text string, lang string, source string",
        )
        append_curated(spark, str(corpus), batch)
    before = {r.doc_id for r in corpus_view(spark, str(corpus)).collect()}

    assert main(["corpus", "compact", "--dir", str(corpus), "--max-files", "1"]) == 0
    out = capsys.readouterr().out
    assert "compacted" in out and "0 partition" not in out.split("compacted")[1][:4]
    assert {r.doc_id for r in corpus_view(spark, str(corpus)).collect()} == before

    assert main(["corpus", "repair-sigs", "--dir", str(corpus)]) == 0
    assert "backfilled" in capsys.readouterr().out

    assert main(["corpus", "seed-bloom", "--dir", str(corpus), "--bloom-log", str(tmp_path / "bl")]) == 0
    assert "seeded" in capsys.readouterr().out
    # the seeded log immediately guards: re-crawl of compacted content drops
    recrawl = spark.createDataFrame(
        [(999, text + "cli 0 0", "en", "s9")],
        "doc_id long, text string, lang string, source string",
    )
    append_curated(
        spark, str(corpus), recrawl, bloom_log_dir=str(tmp_path / "bl"), batch_id=0
    )
    assert {r.doc_id for r in corpus_view(spark, str(corpus)).collect()} == before


def test_cli_index_lifecycle(tmp_path, capsys, spark):
    """index build → query → append → compact → identical query results:
    the retrieval index driven end-to-end through the CLI."""
    import json as _json

    docs = [
        (i, f"vector stream merge data number {i}", "en", "s0")
        for i in range(20)
    ]
    corpus_a = tmp_path / "docs_a"
    corpus_b = tmp_path / "docs_b"
    spark.createDataFrame(docs[:12], "doc_id long, text string, lang string, source string").write.parquet(str(corpus_a))
    spark.createDataFrame(docs[12:], "doc_id long, text string, lang string, source string").write.parquet(str(corpus_b))
    idx = tmp_path / "idx"

    assert main(["index", "build", "--dir", str(idx), "--corpus", str(corpus_a), "--buckets", "8"]) == 0
    assert "indexed 12" in capsys.readouterr().out

    assert main(["index", "query", "--dir", str(idx), "--terms", "vector,stream", "--buckets", "8"]) == 0
    first = [_json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert first and all(r["matched"] == 2 for r in first)

    assert main(["index", "append", "--dir", str(idx), "--corpus", str(corpus_b), "--buckets", "8"]) == 0
    capsys.readouterr()
    assert main(["index", "query", "--dir", str(idx), "--terms", "vector,stream", "--buckets", "8"]) == 0
    with_appended = capsys.readouterr().out

    assert main(["index", "compact", "--dir", str(idx), "--max-files", "1"]) == 0
    out = capsys.readouterr().out
    assert "compacted" in out
    assert main(["index", "query", "--dir", str(idx), "--terms", "vector,stream", "--buckets", "8"]) == 0
    assert capsys.readouterr().out == with_appended


def test_cli_dq_lifecycle(tmp_path, capsys, spark):
    """audit (green + red exit codes) -> publish -> report, end to end."""
    import os

    from pyspark.sql import functions as F

    data = str(tmp_path / "in.parquet")
    spark.range(10).select(
        "id", (F.col("id") * 10.0).alias("price")
    ).write.parquet(data)
    suite = tmp_path / "suite.json"
    suite.write_text(
        json.dumps(
            [
                {"type": "row_count", "lo": 1},
                {"type": "completeness", "col": "id", "min_ratio": 1.0},
                {"type": "in_range", "col": "price", "lo": 0, "hi": 1000},
                {"type": "mean_between", "col": "price", "lo": 0, "hi": 100},
            ]
        )
    )
    assert main(["dq", "audit", "--data", data, "--suite", str(suite)]) == 0
    cap = capsys.readouterr()
    rows = [json.loads(line) for line in cap.out.strip().splitlines()]
    assert len(rows) == 4 and all(r["passed"] for r in rows)
    assert "4 check(s) passed" in cap.err

    # a red contract exits 1 and names the failing check
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps([{"type": "in_range", "col": "price", "lo": 0, "hi": 5}]))
    assert main(["dq", "audit", "--data", data, "--suite", str(bad)]) == 1
    assert "FAILED: in_range(price)" in capsys.readouterr().err

    out = str(tmp_path / "snap")
    assert main(["dq", "publish", "--data", data, "--suite", str(suite), "--out", out]) == 0
    assert "4 check(s) green" in capsys.readouterr().out
    assert os.path.isdir(out)

    # failing publish quarantines and exits 1; snapshot untouched
    assert main(["dq", "publish", "--data", data, "--suite", str(bad),
                 "--out", out, "--overwrite"]) == 1
    assert "quarantined" in capsys.readouterr().err

    assert main(["dq", "report", "--out", out]) == 0
    audit = json.loads(capsys.readouterr().out)
    assert audit["ok"] and len(audit["checks"]) == 4
