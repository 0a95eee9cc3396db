"""Structured Streaming query paths (rows-only checks) — populated next."""
