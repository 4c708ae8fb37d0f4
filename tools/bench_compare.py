"""Compare two bench_runs.json files (or BENCH_r*.json with a queries
map): per-query best-of deltas, regressions flagged.

    python tools/bench_compare.py bench_runs_old.json bench_runs.json
"""

from __future__ import annotations

import json
import sys


def _best(obj) -> dict[str, float]:
    if "runs" in obj:
        return {k: min(v) for k, v in obj["runs"].items()}
    return {k: (min(v) if isinstance(v, list) else v) for k, v in obj.get("queries", {}).items()}


def main(a_path: str, b_path: str, reg_ratio: float = 1.3, reg_abs: float = 0.3) -> int:
    a, b = _best(json.load(open(a_path))), _best(json.load(open(b_path)))
    common = sorted(set(a) & set(b), key=lambda k: -(b[k] - a[k]))
    regressions = []
    for k in common:
        delta = b[k] - a[k]
        flag = ""
        if b[k] > reg_ratio * a[k] and delta > reg_abs:
            flag = "  <-- REGRESSION"
            regressions.append(k)
        print(f"{a[k]:8.3f} -> {b[k]:8.3f}  ({delta:+.3f})  {k}{flag}")
    only_a, only_b = sorted(set(a) - set(b)), sorted(set(b) - set(a))
    print(f"\ncomparable: {len(common)}  removed: {len(only_a)}  added: {len(only_b)}")
    print(f"total over comparable: {sum(a[k] for k in common):.2f} -> {sum(b[k] for k in common):.2f}")
    if only_b:
        print("added:", ", ".join(only_b))
    if regressions:
        print("REGRESSIONS:", ", ".join(regressions))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:3]))
