"""Driver-gate mirror for every registered query: Spark result must match
the DuckDB oracle exactly at sf0.001."""

from __future__ import annotations

import pytest

from eth_event_tracker_spark.queries import REGISTRY, _load

from .oracle_harness import compare

_load()
_WITH_ORACLE = [n for n, q in REGISTRY.items() if q.oracle is not None]


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    q = REGISTRY[name]
    compare(q.fn(spark, sf_dir), duck, q.oracle, name)


def test_registry_nonempty():
    assert len(REGISTRY) >= 10
