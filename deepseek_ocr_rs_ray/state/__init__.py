"""Durable job state: per-partition lineage manifests and stage metrics."""
