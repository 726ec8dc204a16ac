"""Structured Streaming surface (incremental-batch extraction)."""
