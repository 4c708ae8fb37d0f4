"""Streaming analytics operators — the Structured Streaming twins of the
batch queries in ``queries/streams.py`` (same expressions → identical
results), plus a custom stateful operator via applyInPandasWithState.

The chain engine's own 'lateness' is depth-based (O-5), handled by the
source; these operators cover the *time*-based streaming semantics the
relational surface needs over event streams: watermarks for late data,
windowed aggregation, and arbitrary keyed state.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def tumbling_counts(df: DataFrame, watermark: str | None = None) -> DataFrame:
    """10-minute tumbling window counts per event type — identical
    expression to the batch query `events_time_windows` (tumbling arm); pass a
    watermark (e.g. "30 minutes") on a streaming df to bound state and
    drop late rows."""
    if watermark:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


RUNNING_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)
RUNNING_STATE = StructType(
    [StructField("n", LongType()), StructField("last_us", LongType())]
)


def _running_count_fn(key, pdfs, state: GroupState):
    """Keyed state: total event count + most recent event time per user.
    State is a (count, last_ts_micros) tuple carried across micro-batches."""
    n, last_us = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].max().value // 1000))
    state.update((n, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "last_ts": [pd.Timestamp(last_us * 1000)],
        }
    )


def stateful_running_counts(stream_df: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    totals that survive across micro-batches — the pattern for any
    reference-style bespoke state (the reorg machine's per-filter counters,
    rate trackers, dedup caches) when it must live *inside* the stream."""
    return stream_df.groupBy("user_id").applyInPandasWithState(
        _running_count_fn,
        outputStructType=RUNNING_OUTPUT,
        stateStructType=RUNNING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _make_running_counts_processor():
    """Build the TWS processor class.  Module-importable without the TWS
    runtime deps: the ``stateful_processor`` API module imports cleanly —
    only the state-server wire protocol needs google-protobuf — so the
    accumulate logic is unit-testable against a stub handle
    (tests/test_streaming_analytics.py) even where the runtime skips."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningCountsProcessor(StatefulProcessor):
        """Accumulate step shared verbatim with ``_running_count_fn`` —
        the two APIs differ only in how state is handed in (GroupState
        properties vs ValueState methods)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("counts", RUNNING_STATE)

        def handleInputRows(self, key, rows, timerValues):
            n, last_us = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    last_us = max(last_us, int(pdf["ts"].max().value // 1000))
            self._state.update((n, last_us))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "last_ts": [pd.Timestamp(last_us * 1000)],
                }
            )

        def close(self) -> None:
            pass

    return RunningCountsProcessor


def stateful_running_counts_tws(stream_df: DataFrame) -> DataFrame:
    """Same operator on Spark 4's transformWithStateInPandas — the
    successor API to applyInPandasWithState (typed state handles, timers,
    schema evolution; runs on the RocksDB state store, which is the
    provider a 100 TB deployment uses anyway for state larger than
    executor heap).  Kept as a twin of ``stateful_running_counts`` and
    pytest-pinned equal so the engine carries both the widest-compat and
    the current-API form.  Runtime requirements beyond the API itself:
    the ``google-protobuf`` package (the TWS Python state-server protocol
    is protobuf-based) — the runtime pin test skips with a named reason
    where it is absent; the accumulate logic itself is pinned by a
    protobuf-free unit test either way."""
    return stream_df.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_running_counts_processor()(),
        outputStructType=RUNNING_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )


def stream_stream_attribution(
    views: DataFrame,
    purchases: DataFrame,
    watermark: str = "30 minutes",
    horizon: str = "1 hour",
    join_type: str = "inner",
) -> DataFrame:
    """Stream-stream join: attribute each purchase to the user's prior
    view within ``horizon`` — the canonical watermarked two-stream join.

    Both sides carry a watermark and the join condition pairs the
    equality key (user_id) with a TIME-RANGE predicate, which is what
    lets the engine bound state: a buffered view row can be evicted once
    the purchase-side watermark passes view_ts + horizon, so state is
    O(rate × horizon) per key range, not O(stream).  ``join_type``
    'left_outer' additionally emits view rows with no matching purchase
    AFTER their join window closes (the engine needs the watermark to
    know no future purchase can match) — nulls on the purchase side.

    Scale shape: both streams shuffle once on user_id (co-partitioned
    state store); the range predicate is evaluated within the matched
    key partition.  The batch twin (same expressions over static
    DataFrames) is what tests pin against."""
    v = views.select(
        F.col("user_id"), F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    ).withWatermark("view_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return v.join(p, cond, join_type).select(
        "user_id", "view_id", "view_ts", "purchase_id", "purchase_ts"
    )


def hourly_counts(df: DataFrame, watermark: str | None = None) -> DataFrame:
    """1-hour tumbling counts per event type — the streaming twin of the
    rate monitors' first aggregate (queries/streams.py rate_anomalies /
    changepoint_cusum collapse raw events to exactly this (event_type,
    hr, n) table).  The stream maintains the collapsed count table
    incrementally — state is |types| × open-hours with a watermark —
    and the z-score / CUSUM tails (score_rate_anomalies) run over the
    sink, where they touch |types| × |hours| rows, never raw events.
    For a 1-hour tumbling window, window.start ≡ date_trunc('hour', ts),
    so the streamed table is row-identical to the batch aggregate
    (pinned in tests/test_streaming_analytics.py)."""
    if watermark:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select("event_type", F.col("w.start").alias("hr"), "n")
    )
