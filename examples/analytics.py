"""Product-analytics tour over the events fixture: funnels, cohorts,
sessionization, time-series motifs, heavy hitters — every step is a
registered, oracle-verified query.

    python examples/analytics.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from eth_event_tracker_spark.queries import all_queries
from eth_event_tracker_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    qs = all_queries()

    print("-- funnel: view -> click -> purchase (ordered, per user) --")
    qs["funnel_conversion"](spark, sf_dir).show(truncate=False)

    print("-- weekly cohort retention matrix --")
    qs["cohort_retention"](spark, sf_dir).orderBy("cohort_week", "week_age").show(10)

    print("-- sessions (30-min gap rule), largest first --")
    qs["sessionize_events_batch"](spark, sf_dir).orderBy(
        "n_events", ascending=False
    ).show(5)

    print("-- SAX motifs: users sharing an 8-char activity-shape word --")
    qs["ts_sax_motifs"](spark, sf_dir).orderBy("n_users", ascending=False).show(
        5, truncate=False
    )

    print("-- heavy hitters (CMS candidates + exact verify) --")
    qs["heavy_hitter_users"](spark, sf_dir).orderBy("cnt", ascending=False).show(5)

    print("-- sessions overlapping incident-user sessions --")
    qs["sessions_overlap_incidents"](spark, sf_dir).show(5)
    spark.stop()


if __name__ == "__main__":
    main()
