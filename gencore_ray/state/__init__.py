"""Checkpoint manifest + counters (lineage state)."""
