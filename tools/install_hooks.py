"""Install the repo's git hooks (round-7 verdict item 1).

Writes .git/hooks/pre-commit to run tools/check_evidence.py whenever a
staged file touches the query registry (eth_event_tracker_spark/queries/)
so a commit that adds a registry entry can never outrun docs/CATALOG.md or
driver_sim_sf01.json again.  Non-registry commits skip the check entirely
(zero overhead).  Bypass with `git commit --no-verify` only when the sf0.1
run is already in flight and will land in the same push.
"""

from __future__ import annotations

import os
import stat

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HOOK = """#!/bin/sh
# auto-installed by tools/install_hooks.py — evidence freshness guard
if git diff --cached --name-only | grep -q '^eth_event_tracker_spark/queries/'; then
    python tools/check_evidence.py || {
        echo 'commit blocked: registry changed but evidence is stale (see above)' >&2
        exit 1
    }
fi
exit 0
"""


def main() -> None:
    hook_path = os.path.join(ROOT, ".git", "hooks", "pre-commit")
    with open(hook_path, "w") as f:
        f.write(HOOK)
    os.chmod(hook_path, os.stat(hook_path).st_mode | stat.S_IXUSR | stat.S_IXGRP)
    print(f"installed {hook_path}")


if __name__ == "__main__":
    main()
