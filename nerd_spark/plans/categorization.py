"""Threat categorization (SURVEY §2.2 P11, §2.9).

The reference eval()'s per-category Python trigger expressions over
each event (reference: common/threat_categorization.py:112-195;
config etc/threat_categorization.yml:24-100). Here the triggers are
tags-DSL conditions compiled once to Column predicates — the shipped
config's trigger forms (regex on description, membership on the
category list, port/protocol comparisons) are all expressible in the
DSL's `matches` / `in` / comparison operators.

Escape hatch for unforeseen config: a trigger the DSL compiler
rejects falls back to `python_trigger_column` — an AST-validated
(whitelist, no attribute-walking to dunders, empty builtins)
restricted Python evaluation inside an Arrow-batched pandas UDF over
only the columns the expression references. This mirrors the
reference's free-form eval() without its arbitrary-code surface, and
it is the documented SLOW path: per-row Python inside the batch, so
a deployment should treat a fallback hit as a lint warning and port
hot rules to the DSL. Evaluation errors on a row mean "trigger not
matched" (the reference wraps its eval the same way,
threat_categorization.py:150-158).
"""

from __future__ import annotations

import ast
import re
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from nerd_spark.plans.tags_dsl import condition_column


@dataclass
class CategoryRule:
    category: str
    condition: str  # tags-DSL over the event row (or restricted Python)
    subcategory_attr: str | None = None  # the '->' extraction


# -- restricted-Python fallback ---------------------------------------------

_ALLOWED_NODES = (
    ast.Expression, ast.BoolOp, ast.And, ast.Or, ast.UnaryOp, ast.Not,
    ast.USub, ast.Compare, ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt,
    ast.GtE, ast.In, ast.NotIn, ast.Is, ast.IsNot, ast.BinOp, ast.Add,
    ast.Sub, ast.Mult, ast.Div, ast.Mod, ast.Name, ast.Load,
    ast.Constant, ast.Call, ast.Attribute, ast.List, ast.Tuple,
    ast.Subscript, ast.Slice, ast.IfExp,
)
_ALLOWED_FUNCS = {"len", "str", "int", "float", "bool", "abs", "min", "max", "any", "all"}
_ALLOWED_METHODS = {
    "lower", "upper", "strip", "split", "startswith", "endswith",
    "count", "find", "get", "search", "match", "findall",
}
# flag ATTRIBUTES on the re surface (attribute loads, not calls) — so
# `re.search(p, s, re.IGNORECASE)` validates (ADVICE r6: these were
# exposed on _SafeRe but unreachable past the attribute whitelist)
_ALLOWED_RE_FLAGS = {"IGNORECASE", "I"}


def _validate(tree: ast.AST, columns: set[str]) -> set[str]:
    """Whitelist-check the AST; return the column names referenced."""
    used: set[str] = set()
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise ValueError(
                f"python trigger: disallowed syntax {type(node).__name__}"
            )
        if isinstance(node, ast.Attribute):
            if node.attr.startswith("_"):
                raise ValueError("python trigger: underscore attribute")
            # flag attributes are valid ONLY on the re module itself:
            # `description.IGNORECASE` must reject at compile time
            # (not silently evaluate to False per row)
            is_re_flag = node.attr in _ALLOWED_RE_FLAGS and (
                isinstance(node.value, ast.Name) and node.value.id == "re"
            )
            if node.attr not in _ALLOWED_METHODS and not is_re_flag:
                raise ValueError(f"python trigger: method {node.attr!r} not allowed")
        if isinstance(node, ast.Call):
            f = node.func
            if isinstance(f, ast.Name):
                if f.id not in _ALLOWED_FUNCS:
                    raise ValueError(f"python trigger: call {f.id!r} not allowed")
            elif not isinstance(f, ast.Attribute):
                raise ValueError("python trigger: computed call target")
        if isinstance(node, ast.Name):
            if node.id in columns:
                used.add(node.id)
            elif node.id not in _ALLOWED_FUNCS and node.id != "re":
                raise ValueError(f"python trigger: unknown name {node.id!r}")
    return used


# -- resource-exhaustion guards (the sandbox blocks code execution;
# these bound CPU/memory: triggers come from config, and a config
# typo must not hang or OOM an executor per row) -----------------------------

_MAX_REPEAT_ELEMS = 100_000  # cap on len(seq) * times for seq * int
_MAX_REGEX_LEN = 256
_MAX_REGEX_QUANTIFIERS = 20


def _mul(a, b):
    """Guarded `*`: sequence repetition (str/bytes/list/tuple * int)
    is capped — `description * 10**10` must raise (-> row False), not
    allocate tens of GB. Numeric * numeric passes through."""
    for seq, times in ((a, b), (b, a)):
        if isinstance(seq, (str, bytes, list, tuple)) and isinstance(times, int):
            if len(seq) * max(times, 0) > _MAX_REPEAT_ELEMS:
                raise ValueError("python trigger: repetition too large")
    return a * b


class _MulGuard(ast.NodeTransformer):
    """Rewrite `l * r` -> `_mul(l, r)` so the runtime cap applies to
    column values whose types the static whitelist can't see."""

    def visit_BinOp(self, node):  # noqa: N802 — ast visitor contract
        self.generic_visit(node)
        if isinstance(node.op, ast.Mult):
            return ast.copy_location(
                ast.Call(
                    func=ast.Name(id="_mul", ctx=ast.Load()),
                    args=[node.left, node.right],
                    keywords=[],
                ),
                node,
            )
        return node


class _SafeRe:
    """The `re` surface exposed to triggers: compiled-pattern cache
    (patterns come from config — a handful, re-evaluated per row
    without this) plus a length/complexity cap as a catastrophic-
    backtracking heuristic (a full ReDoS analysis is out of scope;
    the cap rejects the pathological stacked-quantifier shapes)."""

    @staticmethod
    def _compiled(pattern: str, flags: int = 0):
        if not isinstance(pattern, str):
            raise TypeError("python trigger: regex pattern must be a string")
        if len(pattern) > _MAX_REGEX_LEN:
            raise ValueError("python trigger: regex pattern too long")
        if sum(pattern.count(c) for c in "*+{") > _MAX_REGEX_QUANTIFIERS:
            raise ValueError("python trigger: regex pattern too complex")
        return _compile_cached(pattern, flags)

    def search(self, pattern, string, flags=0):
        return self._compiled(pattern, flags).search(string)

    def match(self, pattern, string, flags=0):
        return self._compiled(pattern, flags).match(string)

    def findall(self, pattern, string, flags=0):
        return self._compiled(pattern, flags).findall(string)

    IGNORECASE = re.IGNORECASE
    I = re.IGNORECASE  # noqa: E741 — mirrors the re module surface


from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=256)
def _compile_cached(pattern: str, flags: int):
    return re.compile(pattern, flags)


def _validate_const_regexes(tree: ast.AST) -> None:
    """Compile-time check of CONSTANT regex arguments to re.* calls.

    The _SafeRe caps otherwise only fire inside per-row evaluation,
    where trigger errors map to False — a configured over-cap or
    syntactically invalid pattern would silently match nothing (and
    compile_report would call the rule 'python', not 'error'). A
    constant pattern is fully checkable at plan time, so reject the
    rule loudly here instead (ADVICE r6). Patterns built from row
    values stay runtime-checked."""
    for node in ast.walk(tree):
        if not (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and isinstance(node.func.value, ast.Name)
            and node.func.value.id == "re"
            and node.func.attr in {"search", "match", "findall"}
            and node.args
            and isinstance(node.args[0], ast.Constant)
        ):
            continue
        try:
            _SafeRe._compiled(node.args[0].value)
        except re.error as exc:
            raise ValueError(f"python trigger: invalid regex: {exc}") from exc
        # TypeError/ValueError from the caps propagate as-is (loud)


def python_trigger_column(expr: str, df: DataFrame) -> Column:
    """Compile a restricted-Python trigger to a boolean Column via an
    Arrow-batched pandas UDF over exactly the referenced columns.
    Raises ValueError at plan time for disallowed syntax; per-row
    evaluation errors yield False (reference semantics)."""
    tree = ast.parse(expr, mode="eval")
    used = sorted(_validate(tree, set(df.columns)))
    _validate_const_regexes(tree)
    tree = ast.fix_missing_locations(_MulGuard().visit(tree))
    code = compile(tree, "<trigger>", "eval")
    import builtins as _bi

    env_base = {
        "__builtins__": {},
        "re": _SafeRe(),
        "_mul": _mul,
        **{n: getattr(_bi, n) for n in _ALLOWED_FUNCS},
    }

    def fn(*cols: pd.Series) -> pd.Series:
        out = []
        for vals in zip(*cols):
            env = dict(env_base)
            env.update(zip(used, vals))
            try:
                out.append(bool(eval(code, env)))  # noqa: S307 — AST-whitelisted
            except Exception:
                out.append(False)
        return pd.Series(out)

    if not used:  # constant expression: evaluate once at plan time
        env = dict(env_base)
        try:
            return F.lit(bool(eval(code, env)))  # noqa: S307
        except Exception:
            return F.lit(False)
    udf = pandas_udf(fn, "boolean")
    return udf(*[F.col(c) for c in used])


def trigger_column(condition: str, df: DataFrame) -> Column:
    """DSL compile first; restricted-Python fallback for expressions
    outside the grammar (the reference's free-form eval triggers).
    A fallback hit logs a structured warning at compile time — the
    Python path is per-row eval inside the pandas UDF, so a deployment
    should treat the warning as a lint: port the rule to the DSL."""
    import logging

    try:
        return condition_column(condition, df)
    except (ValueError, TypeError) as dsl_err:
        col = python_trigger_column(condition, df)
        logging.getLogger("nerd_spark.categorization").warning(
            "trigger %r fell back to restricted-Python (SLOW per-row "
            "path); DSL compile error: %s", condition, dsl_err
        )
        return col


def compile_report(
    rules: list[CategoryRule], df: DataFrame
) -> list[dict[str, str]]:
    """Per-rule compile-path report — the runtime signal the advisor
    asked for: which rules run as native Columns vs the restricted-
    Python escape hatch (and which fail both). Run it at deploy time /
    in CI against the event schema; a 'python' path entry is a perf
    lint, an 'error' entry is a broken rule."""
    out = []
    for r in rules:
        try:
            condition_column(r.condition, df)
            path, detail = "column", ""
        except (ValueError, TypeError) as dsl_err:
            try:
                python_trigger_column(r.condition, df)
                path, detail = "python", str(dsl_err)
            except Exception as py_err:  # noqa: BLE001 — report, not raise
                path, detail = "error", f"dsl: {dsl_err}; python: {py_err}"
        out.append({"category": r.category, "path": path, "detail": detail})
    return out


def categorize(events: DataFrame, rules: list[CategoryRule]) -> DataFrame:
    """One output row per (event, matched category): id columns +
    (category, subcategory). An event matching no rule emits nothing —
    same as the reference's trigger loop."""
    matches = F.array_compact(
        F.array(
            *[
                F.when(
                    trigger_column(r.condition, events),
                    F.struct(
                        F.lit(r.category).alias("category"),
                        (
                            F.col(r.subcategory_attr).cast("string")
                            if r.subcategory_attr
                            else F.lit(None).cast("string")
                        ).alias("subcategory"),
                    ),
                )
                for r in rules
            ]
        )
    )
    return (
        events.withColumn("_cat", F.explode(matches))
        .withColumn("category", F.col("_cat.category"))
        .withColumn("subcategory", F.col("_cat.subcategory"))
        .drop("_cat")
    )
