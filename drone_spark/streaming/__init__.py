"""Structured Streaming operators (windowed aggregation, stream dedup).

The reference has no streaming at all (SURVEY §2.8); these exist so the
engine covers the stream side of a web-corpus ingestion pipeline —
pages/events arriving continuously — using watermarks + windows instead
of custom plumbing.
"""
