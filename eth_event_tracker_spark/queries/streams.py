"""Event-stream analytics queries (time windows, sessionization, dedup)
over the `events` fixture. Filled in Phase 1."""
