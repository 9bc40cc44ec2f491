"""Query registry + job orchestration (lineage, metrics, resume)."""
