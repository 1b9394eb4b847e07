"""Incremental ingest (the reference's auto-commit, as micro-batches)."""
