"""Custom operators: the update-op merge algebra, dedup, similarity,
range/as-of joins, top-k — everything SURVEY.md §2 requires that is
not a single built-in DataFrame call.
"""
