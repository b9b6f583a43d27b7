"""Streaming layer: the reference's Flink-SQL pipeline re-expressed as
Structured Streaming micro-batches over lake tables."""
