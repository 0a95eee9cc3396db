"""Structured Streaming pipelines: the IDEA ingest path and the
entity-table maintenance loop (SURVEY §2.8, §3.1).
"""
