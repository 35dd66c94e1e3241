"""Structured Streaming operators: tiled window aggregation (the online
half of the lambda architecture), gap sessionization, watermark policy."""
