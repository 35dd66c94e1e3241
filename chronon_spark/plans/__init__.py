"""Backfill planning & orchestration: partition-range math, unfilled-range
detection (checkpoint/resume), step chunking, lineage metrics."""
