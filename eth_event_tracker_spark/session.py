"""SparkSession construction tuned for this engine.

Local testing runs on ``local[N]``; the configs below are the ones that
matter at cluster scale too (AQE, shuffle partitioning, Arrow) — partition
sizing is expressed in bytes/ratios rather than absolute counts so the same
plan survives a 1000-executor deployment reading ~100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


# The 100 TB streaming state provider: RocksDB spills keyed state to local
# disk (the default HDFSBackedStateStoreProvider holds every key in executor
# heap — a non-starter for wide keyed state), and changelog checkpointing
# uploads per-batch deltas instead of full snapshots.  Ships inside Spark's
# distribution (rocksdbjni) — no extra dependency.
ROCKSDB_STATE_CONF: dict[str, str] = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
}


def get_spark(
    app_name: str = "eth-event-tracker-spark",
    *,
    shuffle_partitions: int | None = None,
    state_store: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Scale notes:
    - AQE on: runtime partition coalescing + skew-join splitting replace any
      hand-tuned static partition counts at 100 TB.
    - ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; on a
      real cluster set it ~2-3x total cores and let AQE coalesce.
    - Arrow on: every Pandas UDF / mapInPandas transfer is columnar.
    - Session timezone pinned to UTC so timestamp semantics match the
      DuckDB oracle and are cluster-locale-independent.
    - ``state_store="rocksdb"`` (or env ``SPARK_GRAFT_STATE_STORE=rocksdb``)
      applies :data:`ROCKSDB_STATE_CONF` — the streaming state provider a
      100 TB deployment runs (round-6 advice #5).  Session-level conf, so
      it also works on an existing session via ``spark.conf.set``.
    """
    # make the package importable inside executor Python workers (needed by
    # the custom data source class, which tasks unpickle by module path)
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_parent}{os.pathsep}{pp}" if pp else pkg_parent
    # many-concurrent-streams robustness: every spawned Python process
    # (executor worker, driver-side streaming-source runner) connects back
    # to the JVM under a 15 s default socket timeout
    # (pyspark.util.local_connect_and_auth) — a start storm of dozens of
    # streaming queries can push interpreter startup past it.  60 s is
    # inert in the common case (the timeout only bounds a connect that is
    # already in flight) and absorbs the storm.  The JVM-side accept
    # window (PythonWorkerFactory.PROCESS_WAIT_TIMEOUT_MS = 10 s) is
    # hard-coded in Spark, so callers starting many queries must also
    # stagger the STARTS (tests/test_multi_filter.py does, in waves).
    # NOTE: the env var only reaches JVM-spawned workers if it is set in
    # this process BEFORE the JVM launches (worker env is inherited from
    # the JVM).  For sessions created elsewhere / getOrCreate reuse, the
    # spark.executorEnv.* conf below carries it through SparkConf instead.
    os.environ.setdefault("SPARK_AUTH_SOCKET_TIMEOUT", "60")

    master = os.environ.get("SPARK_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
    n_shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # fixture events.parquet stores TIMESTAMP(NANOS); Spark has no nanos
        # timestamp — read as long, tables.load_table converts to micros
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        # local-mode runs the whole cluster (32 executor threads, block
        # storage for localCheckpoints, broadcast builds) inside the one
        # driver JVM — the 1g default heap starves broadcast construction
        # at 10x-fixture volumes.  Applied only at JVM launch; a cluster
        # deployment sizes driver/executor memory in its submit conf.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # belt-and-braces for the SPARK_AUTH_SOCKET_TIMEOUT env above: on a
        # cluster (or a JVM launched before this getter ran) executor-side
        # Python workers inherit it from this conf, not our process env
        .config(
            "spark.executorEnv.SPARK_AUTH_SOCKET_TIMEOUT",
            os.environ.get("SPARK_AUTH_SOCKET_TIMEOUT", "60"),
        )
    )
    if (state_store or os.environ.get("SPARK_GRAFT_STATE_STORE", "")).lower() == "rocksdb":
        for k, v in ROCKSDB_STATE_CONF.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
