"""Log filtering operators — the reference's P-group.

The reference pushes these into the eth_getLogs RPC request
(FilterConfig.getFilterSearch, tracker.go:62-71) so the server filters;
here they are Catalyst predicates, which parquet scans push down the same
way (PushedFilters on address; topics via array element predicates).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def address_filter(df: DataFrame, addresses: Sequence[str]) -> DataFrame:
    """P-1 — logs where address ∈ {A1..An}; empty list = match all
    (tracker.go:40,62-66). `isin` compiles to an In predicate that reaches
    the parquet scan (PushedFilters) — at 100 TB the scan, not Spark,
    drops non-matching row groups via dictionary/min-max stats."""
    if not addresses:
        return df
    return df.where(F.col("address").isin([a.lower() for a in addresses]))


def topic_position_predicate(topics: Sequence[str | None], col: str = "topics") -> Column:
    """P-2 — positional topic match with nil wildcards (tracker.go:41,52-58;
    wildcard semantics per tracker_test.go:136: Topics [nil, T] matches any
    topic0).  A log matches iff for every non-null position i,
    topics[i] == T_i; logs with fewer topics than the highest constrained
    position don't match (element_at returns NULL → predicate false)."""
    pred = F.lit(True)
    for i, t in enumerate(topics):
        if t is not None:
            pred = pred & (F.element_at(F.col(col), i + 1) == F.lit(t.lower()))
    return pred


def topic_filter(df: DataFrame, topics: Sequence[str | None], col: str = "topics") -> DataFrame:
    return df.where(topic_position_predicate(topics, col))


def event_signature_filter(df: DataFrame, sig_hash: str, col: str = "topics") -> DataFrame:
    """P-3 — client-side event match: topic0 == event signature hash
    (consumer pattern, README.md:28-34,94-104)."""
    return df.where(F.element_at(F.col(col), 1) == F.lit(sig_hash.lower()))


def kv_prefix_scan(df: DataFrame, prefix: str) -> DataFrame:
    """S-10 — list KV rows whose key starts with prefix
    (store/store.go:10-11; pg LIKE 'p%' postgresql_store.go:62-68).
    startswith compiles to StringStartsWith, pushed to parquet min-max."""
    return df.where(F.col("key").startswith(prefix))
