"""Composed pipelines mirroring the reference's DAG chains (SURVEY §3)."""
