"""Fast registry-vs-evidence freshness guard (round-7 verdict item 1).

The registry-outruns-evidence race shipped a red test suite once (round 7's
end-of-round snapshot added 5 queries without regenerating docs/CATALOG.md or
driver_sim_sf01.json) and nearly shipped twice before (docs/ROUND7.md §4).
This is the cheap half of the two pytest freshness gates, runnable in
seconds without a Spark session or an sf0.1 run:

  * every registry entry must appear in docs/CATALOG.md, and
  * every registry entry must appear in driver_sim_sf01.json.

Exit 1 with the missing names when either artifact is stale.  Wired into
.git/hooks/pre-commit (installed by `make hooks`, and directly by
tools/install_hooks.py) so a commit that adds a registry entry without its
evidence fails at commit time, not at judging time.  Regenerate with:

    python tools/catalog_report.py        # cheap, rewrites docs/CATALOG.md
    python tools/sf01_gate.py --update    # ~10 min, full sf0.1 registry run

or `make evidence` for both.
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    from eth_event_tracker_spark.queries import REGISTRY, _load

    _load()
    names = set(REGISTRY)

    problems: list[str] = []

    catalog_path = os.path.join(ROOT, "docs", "CATALOG.md")
    with open(catalog_path) as f:
        catalog = f.read()
    in_catalog = set(re.findall(r"\| `([^`]+)` \|", catalog))
    missing_catalog = sorted(names - in_catalog)
    if missing_catalog:
        problems.append(
            f"docs/CATALOG.md is STALE — missing {len(missing_catalog)} registry "
            f"entries: {', '.join(missing_catalog)}\n"
            "  fix: python tools/catalog_report.py"
        )

    baseline_path = os.path.join(ROOT, "driver_sim_sf01.json")
    with open(baseline_path) as f:
        baseline = json.load(f)
    missing_sf01 = sorted(names - set(baseline))
    if missing_sf01:
        problems.append(
            f"driver_sim_sf01.json is STALE — missing {len(missing_sf01)} registry "
            f"entries: {', '.join(missing_sf01)}\n"
            "  fix: python tools/sf01_gate.py --update"
        )

    plans_path = os.path.join(ROOT, "docs", "PLANS.md")
    with open(plans_path) as f:
        plans = f.read()
    in_plans = set(re.findall(r"^\| (\S+) \|", plans, re.M))
    missing_plans = sorted(names - in_plans)
    if missing_plans:
        problems.append(
            f"docs/PLANS.md is STALE — missing {len(missing_plans)} registry "
            f"entries: {', '.join(missing_plans)}\n"
            "  fix: python tools/plan_report.py"
        )

    if problems:
        print("EVIDENCE GUARD FAILED:\n" + "\n".join(problems))
        return 1
    print(
        f"evidence fresh: {len(names)} registry entries covered by "
        "CATALOG + PLANS + sf0.1 baseline"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
