"""End-to-end Ray Data pipelines (extraction flagship + relational/corpus ops)."""
