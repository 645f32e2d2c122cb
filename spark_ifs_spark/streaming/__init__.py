"""Structured Streaming surface (extension; the reference is batch-only,
SURVEY §1.4/§2.8)."""
