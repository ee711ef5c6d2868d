"""Structured Streaming layer (SURVEY §2.9 ST1-ST8)."""
