"""Structured-Streaming CDC ingest layer (reference O1/O8/O9/O10/O16)."""
