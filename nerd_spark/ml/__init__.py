"""Batch ML scoring: the FMP ('future misbehavior probability')
pipeline shape (SURVEY §3.3).
"""
