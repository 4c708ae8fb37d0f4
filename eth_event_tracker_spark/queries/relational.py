"""Relational surface over the TPC-H-ish fixtures (SURVEY §2 Part B):
joins, aggregations, windows, set ops, sort/limit. Filled in Phase 1."""
