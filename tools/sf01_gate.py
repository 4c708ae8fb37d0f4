"""One-shot sf0.1 full-registry correctness gate (round-6 advice #1).

The sf0.01 gate has missed two real bugs that only surfaced at sf0.1
density (the nondeterministic indx-assignment row drop in round 5, the
RANGE-frame second-truncation divergence in round 6), so the sf0.1 run
is a routine, not an afterthought.  This wraps it as one command:

    python tools/sf01_gate.py              # full registry, diff vs baseline
    python tools/sf01_gate.py --window 50  # graded window only (CI/pytest)
    python tools/sf01_gate.py --update     # full run, rewrite the baseline

It runs tools/driver_sim.py at /root/testdata/sf0.1, parses the
per-query verdicts, and diffs {status, rows} per query against the
committed evidence file ``driver_sim_sf01.json`` at the repo root.  Any
driver_sim failure, any status/row drift, or any query missing from the
baseline fails the gate (exit 1).  ``--update`` is only valid for full
runs so a windowed run can never silently shrink the evidence.

Every query here is deterministic by design (hash sampling, seeded
k-means/hyperplanes, canonical orderings), so sf0.1 row counts are
stable run-over-run — drift means a behavior change, exactly what the
gate exists to catch.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(ROOT, "driver_sim_sf01.json")
SF_DIR = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")

_VERDICT = re.compile(r"^(OK|MISMATCH) (\S+): rows (\d+)/(\d+)")
_ROWS_ONLY = re.compile(r"^ROWS-ONLY (\S+): rows=(\d+)")
_ERROR = re.compile(r"^ERROR (\S+): (.*)")


def run_driver_sim(window: int | None = None) -> tuple[int, dict[str, dict], str]:
    """Run driver_sim at sf0.1; return (returncode, {query: {status, rows}},
    raw stdout)."""
    cmd = [sys.executable, os.path.join(ROOT, "tools", "driver_sim.py"), SF_DIR]
    if window is not None:
        cmd.append(str(window))
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT)
    results: dict[str, dict] = {}
    for line in proc.stdout.splitlines():
        if m := _VERDICT.match(line):
            results[m.group(2)] = {"status": m.group(1), "rows": int(m.group(3))}
        elif m := _ROWS_ONLY.match(line):
            results[m.group(1)] = {"status": "ROWS-ONLY", "rows": int(m.group(2))}
        elif m := _ERROR.match(line):
            results[m.group(1)] = {"status": "ERROR", "rows": None}
    return proc.returncode, results, proc.stdout + proc.stderr[-2000:]


def diff_vs_baseline(results: dict[str, dict], full_run: bool = True) -> list[str]:
    """Per-query {status, rows} drift vs the committed evidence file.

    ``full_run=True`` also flags baseline queries MISSING from the run —
    a deleted registry entry or an unparseable verdict line must fail
    the gate, or the evidence silently shrinks (round-7 review).  A
    windowed run covers a prefix by construction, so the reverse check
    is skipped there."""
    if not os.path.exists(BASELINE):
        return [f"missing baseline {BASELINE} — run with --update first"]
    with open(BASELINE) as fh:
        base = json.load(fh)
    problems = []
    for name, got in results.items():
        want = base.get(name)
        if want is None:
            problems.append(f"{name}: not in baseline (new query? run --update)")
        elif got != want:
            problems.append(f"{name}: {want} -> {got}")
    if full_run:
        for name in sorted(set(base) - set(results)):
            problems.append(
                f"{name}: in baseline but absent from this run "
                "(registry entry deleted, or its verdict line failed to parse)"
            )
    return problems


def main(argv: list[str]) -> int:
    update = "--update" in argv
    window = None
    if "--window" in argv:
        window = int(argv[argv.index("--window") + 1])
    if update and window is not None:
        print("--update requires a full run (no --window)")
        return 2
    rc, results, raw = run_driver_sim(window)
    bad = sorted(n for n, r in results.items() if r["status"] not in ("OK", "ROWS-ONLY"))
    if rc != 0 or bad:
        print(raw[-4000:])
        print(f"sf0.1 driver_sim FAILED (rc={rc}): {bad}")
        return 1
    if update:
        with open(BASELINE, "w") as fh:
            json.dump(results, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"baseline updated: {len(results)} queries -> {BASELINE}")
        return 0
    problems = diff_vs_baseline(results, full_run=window is None)
    if problems:
        for p in problems:
            print("DRIFT", p)
        return 1
    scope = f"first {window}" if window else "full registry"
    print(f"sf0.1 gate OK: {len(results)} queries ({scope}) match {BASELINE}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
