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
