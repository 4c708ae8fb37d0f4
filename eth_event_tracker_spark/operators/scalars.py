"""Scale-safe scalar attachment.

``F.max(col).over(Window.partitionBy())`` computes a global scalar by
shuffling EVERY row into one task — correct, but a single-partition
bottleneck at 100 TB.  The scale-safe plan is the one the reference
effectively uses (it carries lastBlock/head as a value, tracker.go:611-666):
compute the scalar with a partial+final aggregate (map-side combine, ~one
row per partition crosses the wire), then broadcast the 1-row result into
every row via a broadcast nested-loop cross join — no reshuffle of the
fact table at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_scalars(df: DataFrame, **aggs: Column) -> DataFrame:
    """Attach named scalar aggregates of ``df`` to every row.

    ``with_scalars(logs, _head=F.max("block_num"))`` ≡ a global-window max,
    but the plan is [partial agg → final agg (1 row) → BroadcastExchange →
    BroadcastNestedLoopJoin] instead of [Exchange SinglePartition → Window].
    """
    scalar_row = df.agg(*[c.alias(name) for name, c in aggs.items()])
    return df.crossJoin(F.broadcast(scalar_row))
