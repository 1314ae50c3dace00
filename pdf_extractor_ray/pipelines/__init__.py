"""End-to-end pipelines (the reference's CLI entry points rebuilt)."""
