"""The JDBC store backend end-to-end: tracker sync + live reorg landing
in a SQL database, bulk appends running as distributed ``df.write.jdbc``.

Runs against embedded Derby (on Spark's classpath); point the URL at a
PostgreSQL server (plus its driver jar) for the reference's production
shape (postgresql_store.go).

    python examples/jdbc_backend.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from eth_event_tracker_spark.config import FilterConfig
from eth_event_tracker_spark.schemas import RAW_LOG_SCHEMA
from eth_event_tracker_spark.session import get_spark
from eth_event_tracker_spark.sources.mock_chain import MockProvider
from eth_event_tracker_spark.store import JdbcStore
from eth_event_tracker_spark.streaming import Tracker


def main() -> None:
    spark = get_spark("jdbc-backend-demo")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp()
    store = JdbcStore(
        spark,
        f"jdbc:derby:{tmp}/chain;create=true",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )

    # tracker sync + a live 3-block reorg, all landing in SQL tables
    prov = MockProvider()
    prov.advance(50, logs_per_block=2)
    tracker = Tracker(prov, store, FilterConfig())
    tracker.sync()
    print("synced logs:", tracker.entry.last_index())
    prov.fork(3, logs_per_block=1)
    events = tracker.poll()
    print(
        "reorg: removed", sum(len(e.removed) for e in events),
        "added", sum(len(e.added) for e in events),
    )

    # the distributed bulk path: raw logs as a DataFrame -> executor-side
    # JDBC inserts (two-phase indx assignment, no driver materialization)
    bulk = store.entry("bulk_demo")
    raw = [lg for b in prov.canonical[:10] for lg in b.logs()]
    cols = [f.name for f in RAW_LOG_SCHEMA.fields]
    df = spark.createDataFrame([tuple(lg[c] for c in cols) for lg in raw], RAW_LOG_SCHEMA)
    n = bulk.append_df(df)
    print("bulk append_df rows:", n)

    # and back out as a distributed spark.read.jdbc scan
    bulk.df(spark).show(5, truncate=60)
    store.close()


if __name__ == "__main__":
    main()
