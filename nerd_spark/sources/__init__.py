"""Sources & sinks: IDEA event ingest (batch + streaming), feed
parsers (blacklist/DShield shapes), the event archive, and export
writers — SURVEY.md §2.1.
"""
