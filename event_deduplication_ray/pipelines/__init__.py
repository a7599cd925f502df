"""Composed Dataset DAGs (flagship dedup pipeline + eval harness)."""
