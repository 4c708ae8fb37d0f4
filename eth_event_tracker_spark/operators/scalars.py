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


def json_quarantine(df: DataFrame, col: str, keep: list[str]) -> DataFrame:
    """Dead-letter routing for a semi-structured parse, in ONE pass:
    every row comes back with its parsed VARIANT (``parsed``), an ``ok``
    flag, and a ``reason`` — good rows flow on, bad rows are the
    quarantine table after a filter, and neither side re-scans the
    input (the classic two-branch "parse then anti-join the failures"
    costs the scan twice and can diverge between branches).

    The validity test is the VARIANT parser (``try_parse_json``) — the
    STRICT RFC reader — deliberately not ``from_json``: Spark's
    permissive Jackson path happily extracts fields from a TRUNCATED
    document (``'{"k": 87'`` parses), so it cannot back a quarantine
    decision.  A NULL payload is its own reason (a malformed producer
    and a missing field are different on-call pages).  Pure codegen —
    no Python, no shuffle; extract typed fields downstream with
    ``try_variant_get`` and route on ``reason``."""
    parsed = F.try_parse_json(F.col(col))
    reason = (
        F.when(F.col(col).isNull(), F.lit("null_payload"))
        .when(parsed.isNull(), F.lit("malformed_json"))
        .otherwise(F.lit("ok"))
    )
    return df.select(
        *keep,
        parsed.alias("parsed"),
        (reason == "ok").alias("ok"),
        reason.alias("reason"),
    )
