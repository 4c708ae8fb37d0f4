"""LLM-data-pipeline queries (dedup, similarity search, text analysis)
over `documents` / `embeddings`. Filled in Phase 4."""
