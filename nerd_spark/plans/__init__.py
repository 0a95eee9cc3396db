"""Logical-plan builders: filter-DSL compilers, the query-surface
filter builder, and the derivation pipeline stages. Everything here
compiles configuration to Column expressions at plan time — there is
no runtime interpreter in the data path.
"""
