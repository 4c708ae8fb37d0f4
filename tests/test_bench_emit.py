"""The bench stdout line must NEVER outgrow the capture budget — the r04
and r05 lines both did (driver recorded `parsed: null`), so the capping
logic is pinned directly, Spark-free."""

from __future__ import annotations

import json
import random

from bench import capped_summary


def _runs(n_queries: int, name_len: int = 30) -> dict[str, list[float]]:
    rng = random.Random(5)
    return {
        f"q{'x' * name_len}_{i}": [round(rng.uniform(0.05, 3.0), 4) for _ in range(3)]
        for i in range(n_queries)
    }


def test_line_stays_under_budget_at_any_registry_size():
    for n in (10, 50, 106, 300, 1000):
        runs = _runs(n)
        out = capped_summary(runs, 3, 0.1, max_line=1600)
        line = json.dumps(out, separators=(",", ":"))
        assert len(line) <= 1600, (n, len(line))
        parsed = json.loads(line)
        assert parsed["n_queries"] == n
        assert parsed["queries_omitted"] == n - len(parsed["queries"])
        # totals always cover EVERY query, not just the inlined ones
        assert abs(parsed["value"] - sum(min(v) for v in runs.values())) < 1e-3  # 3-decimal rounding


def test_slowest_queries_survive_the_cut():
    runs = _runs(200)
    out = capped_summary(runs, 3, 0.1, max_line=1600)
    inlined = set(out["queries"])
    best = {k: min(v) for k, v in runs.items()}
    cut = sorted(best.values(), reverse=True)[len(inlined) - 1]
    assert all(best[k] >= cut for k in inlined), "the line must carry the slowest queries"


def test_small_registry_fits_whole():
    runs = _runs(5)
    out = capped_summary(runs, 3, 0.01, max_line=1600)
    assert out["queries_omitted"] == 0 and len(out["queries"]) == 5


def test_pathological_budget_still_parses():
    # even a budget smaller than the envelope yields a valid empty-queries line
    out = capped_summary(_runs(50), 3, 0.1, max_line=10)
    line = json.dumps(out, separators=(",", ":"))
    assert json.loads(line)["queries"] == {}


def test_loadavg_on_line_within_budget():
    """Round-11 verdict item 7 (additions-only): loadavg_start/mid ride
    the one stdout line so a judge can adjudicate a loaded host without
    the 8-core counterfactual — and the line still fits the budget."""
    runs = _runs(300)
    la = {"loadavg_start": [1.234, 9.888, 11.79], "loadavg_mid": [3.9, 5.2, 8.0]}
    out = capped_summary(runs, 3, 0.1, max_line=1600, loadavg=la)
    line = json.dumps(out, separators=(",", ":"))
    assert len(line) <= 1600
    parsed = json.loads(line)
    assert parsed["loadavg_start"] == [1.23, 9.89, 11.79]  # rounded to 2dp
    assert parsed["loadavg_mid"] == [3.9, 5.2, 8.0]
    # additions-only: every pre-existing field still present
    for k in ("metric", "value", "value_median", "unit", "queries",
              "n_queries", "queries_omitted", "full", "n_runs", "sf"):
        assert k in parsed
    # and omitting loadavg keeps the old shape exactly
    assert "loadavg_start" not in capped_summary(runs, 3, 0.1, max_line=1600)
