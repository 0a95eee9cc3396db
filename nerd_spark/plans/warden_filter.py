"""Ingest filter DSL -> Column compiler (SURVEY §2.2 P9).

The reference's WardenFilter evaluates rules of the form
``<path> <op> <value>`` combined with single-level AND/OR, each rule
carrying an action: pass / drop / sample 1-in-N; the FIRST matching
rule wins and a default action applies when none match (reference:
NERDd/warden_receiver.py:209-401).

Spark rebuild: the rule list compiles once into a single boolean
Column (a when/otherwise chain), so filtering is a codegen'd
expression — no per-row interpretation. Sampling is deterministic
(``pmod(hash_col, N) == 0``) instead of random, which makes replays
and oracle comparison exact; the reference samples 1-in-N
statefully, which is equally arbitrary for selection purposes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_COND_RE = re.compile(
    r"""\s*([A-Za-z_][\w.]*)\s*(=|!=|<=|>=|<|>)\s*(?:"([^"]*)"|'([^']*)'|(-?\d+(?:\.\d+)?))\s*"""
)


@dataclass
class Rule:
    condition: str  # e.g. 'event_type = "error" AND value >= 10'
    action: str  # 'pass' | 'drop' | 'sample:<N>'


def _compile_atom(atom: str, df: DataFrame) -> Column:
    m = _COND_RE.fullmatch(atom)
    if not m:
        raise ValueError(f"bad condition atom: {atom!r}")
    path, op, s1, s2, num = m.groups()
    col = F.col(path)
    val = s1 if s1 is not None else s2 if s2 is not None else float(num)
    if isinstance(val, float) and val.is_integer():
        val = int(val)
    ops = {
        "=": col == val,
        "!=": col != val,
        "<": col < val,
        "<=": col <= val,
        ">": col > val,
        ">=": col >= val,
    }
    return ops[op]


def compile_condition(cond: str, df: DataFrame) -> Column:
    """Single-level AND/OR over comparison atoms (no nesting, like the
    reference grammar)."""
    if " OR " in cond and " AND " in cond:
        raise ValueError("single-level combinator only (no mixed AND/OR)")
    if " OR " in cond:
        parts = cond.split(" OR ")
        out = _compile_atom(parts[0], df)
        for p in parts[1:]:
            out = out | _compile_atom(p, df)
        return out
    parts = cond.split(" AND ")
    out = _compile_atom(parts[0], df)
    for p in parts[1:]:
        out = out & _compile_atom(p, df)
    return out


def compile_filter(
    rules: list[Rule], df: DataFrame, default: str = "drop", sample_col: str = "event_id"
) -> Column:
    """Compile the rule list to one boolean keep/drop Column.

    First matching rule wins: when(cond1, act1).when(cond2, act2)...
    """

    def action_col(action: str) -> Column:
        if action == "pass":
            return F.lit(True)
        if action == "drop":
            return F.lit(False)
        if action.startswith("sample:"):
            n = int(action.split(":", 1)[1])
            return F.pmod(F.col(sample_col), F.lit(n)) == 0
        raise ValueError(f"unknown action: {action}")

    out = None
    for r in rules:
        cond = compile_condition(r.condition, df)
        out = F.when(cond, action_col(r.action)) if out is None else out.when(cond, action_col(r.action))
    if out is None:
        return action_col(default)
    return out.otherwise(action_col(default))


def to_oracle_sql_case(rules: list[Rule], default: str = "drop", sample_col: str = "event_id") -> str:
    """The same rule chain as an ANSI-SQL CASE expression (for the
    DuckDB oracle): semantics must match compile_filter exactly."""

    def action_sql(action: str) -> str:
        if action == "pass":
            return "TRUE"
        if action == "drop":
            return "FALSE"
        if action.startswith("sample:"):
            n = int(action.split(":", 1)[1])
            return f"(({sample_col}) % {n} = 0)"
        raise ValueError(action)

    def cond_sql(cond: str) -> str:
        # the restricted grammar is already valid SQL except '=' strings
        # with double quotes -> single quotes
        return re.sub(r'"([^"]*)"', r"'\1'", cond)

    whens = "".join(
        f" WHEN {cond_sql(r.condition)} THEN {action_sql(r.action)}" for r in rules
    )
    return f"CASE{whens} ELSE {action_sql(default)} END"
