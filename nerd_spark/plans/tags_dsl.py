"""Tags DSL -> Column compiler (SURVEY §2.9).

The reference ships a full expression language for rule-based tags:
lexer (reference: NERDd/modules/tags.py:264-435), recursive-descent
parser (:726-920) and a per-record AST interpreter (:443-720),
evaluated in Python for every record on every update. Operators:
and/or/not, == != < <= > >=, in / not in, + - * /, parens, dot-path
attributes, string literals; confidence = numeric condition value,
else 0/1 by truthiness (:973-989).

This module re-implements the language as a *compiler to Column
expressions*: config parses once, every rule becomes part of the
dataset-level plan, and the interpreter disappears from the data
path.

The semantic fine print is NERD's Python coercions, NOT SQL ternary
logic (SURVEY §4 'needs custom work' #3), reproduced explicitly:

- arithmetic operands:  None -> 0; non-numeric (string/bool/list) -> 1
  (tags.py:550-563)
- division by zero -> 0            (tags.py:571-575)
- failed/None comparison -> False  (tags.py:588-589)
- truthiness: None/False/0/''/[] -> False (tags.py:957-971)
- confidence: numeric value of the condition expression when numeric,
  else 1.0/0.0 by truthiness       (tags.py:973-989)

Extension over the reference grammar: `attr matches "regex"` compiles
to rlike() — covering the regex triggers the threat-categorization
config uses (common/threat_categorization.py:144-195), so one
compiler serves both the tags and categorization configs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Lexer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>\d+(?:\.\d+)?)
  | (?P<str>"[^"]*"|'[^']*')
  | (?P<jsonpath>`[^`]*`)
  | (?P<op><=|>=|==|!=|<|>|\+|-|\*|/|\(|\)|\[|\]|,)
  | (?P<word>[A-Za-z_][\w.]*)
    """,
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "in", "true", "false", "null", "matches"}


def tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise ValueError(f"tags DSL: bad character at {pos}: {src[pos:pos + 10]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "word" and text in _KEYWORDS:
            out.append((text, text))
        else:
            out.append((kind, text))
    out.append(("eof", ""))
    return out


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class Lit:
    value: Any


@dataclass
class Attr:
    path: str


@dataclass
class ListLit:
    items: list


@dataclass
class JPath:
    """Backtick JSONPath — evaluates to the *list* of matching values
    (reference: tags.py:386-410 lexeme, :477-492 JSONPathExpr)."""

    expr: str


@dataclass
class Unary:
    op: str
    operand: Any


@dataclass
class Binary:
    op: str
    left: Any
    right: Any


class Parser:
    """Recursive descent over the token list; precedence
    or < and < not < comparison < additive < multiplicative."""

    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def take(self, kind: str | None = None) -> tuple[str, str]:
        tok = self.toks[self.i]
        if kind is not None and tok[0] != kind:
            raise ValueError(f"tags DSL: expected {kind}, got {tok}")
        self.i += 1
        return tok

    def parse(self):
        node = self.or_expr()
        self.take("eof")
        return node

    def or_expr(self):
        node = self.and_expr()
        while self.peek()[0] == "or":
            self.take()
            node = Binary("or", node, self.and_expr())
        return node

    def and_expr(self):
        node = self.not_expr()
        while self.peek()[0] == "and":
            self.take()
            node = Binary("and", node, self.not_expr())
        return node

    def not_expr(self):
        if self.peek()[0] == "not":
            self.take()
            return Unary("not", self.not_expr())
        return self.cmp_expr()

    def cmp_expr(self):
        node = self.add_expr()
        kind, text = self.peek()
        if kind == "op" and text in ("==", "!=", "<", "<=", ">", ">="):
            self.take()
            return Binary(text, node, self.add_expr())
        if kind == "in":
            self.take()
            return Binary("in", node, self.add_expr())
        if kind == "not":  # 'not in'
            self.take()
            self.take("in")
            return Unary("not", Binary("in", node, self.add_expr()))
        if kind == "matches":
            self.take()
            return Binary("matches", node, self.add_expr())
        return node

    def add_expr(self):
        node = self.mul_expr()
        while self.peek() == ("op", "+") or self.peek() == ("op", "-"):
            _, op = self.take()
            node = Binary(op, node, self.mul_expr())
        return node

    def mul_expr(self):
        node = self.atom()
        while self.peek() == ("op", "*") or self.peek() == ("op", "/"):
            _, op = self.take()
            node = Binary(op, node, self.atom())
        return node

    def atom(self):
        kind, text = self.peek()
        if kind == "num":
            self.take()
            return Lit(float(text) if "." in text else int(text))
        if kind == "str":
            self.take()
            return Lit(text[1:-1])
        if kind == "true":
            self.take()
            return Lit(True)
        if kind == "false":
            self.take()
            return Lit(False)
        if kind == "null":
            self.take()
            return Lit(None)
        if kind == "word":
            self.take()
            return Attr(text)
        if kind == "jsonpath":
            self.take()
            return JPath(text[1:-1])
        if (kind, text) == ("op", "("):
            self.take()
            node = self.or_expr()
            if self.peek() != ("op", ")"):
                raise ValueError("tags DSL: expected ')'")
            self.take()
            return node
        if (kind, text) == ("op", "["):
            self.take()
            items = []
            while self.peek() != ("op", "]"):
                items.append(self.atom())
                if self.peek() == ("op", ","):
                    self.take()
            self.take()
            return ListLit(items)
        raise ValueError(f"tags DSL: unexpected token {self.peek()}")


def parse(src: str):
    return Parser(tokenize(src)).parse()


# ---------------------------------------------------------------------------
# Typed compiler: AST -> (Column, kind)
# kind ∈ {'num', 'str', 'bool', 'arr', 'null'} — static NERD-coercion typing
# ---------------------------------------------------------------------------


def _elem_kind_of(dtype: T.DataType) -> str:
    """Kind of an array's elements, for the `in` comparability guard.
    Non-scalar elements ('obj') never match a scalar left side."""
    if isinstance(dtype, T.NumericType):
        return "num"
    if isinstance(dtype, T.BooleanType):
        return "bool"
    if isinstance(dtype, T.StringType):
        return "str"
    return "obj"


def _field_kind(dtype: T.DataType) -> str:
    if isinstance(dtype, (T.NumericType,)):
        return "num"
    if isinstance(dtype, T.BooleanType):
        return "bool"
    if isinstance(dtype, T.ArrayType):
        return "arr"
    return "str"


def _resolve_path(schema: T.StructType, path: str) -> T.DataType | None:
    cur: T.DataType = schema
    for part in path.split("."):
        if isinstance(cur, T.StructType) and part in cur.fieldNames():
            cur = cur[part].dataType
        else:
            return None
    return cur


class Compiler:
    def __init__(self, schema: T.StructType):
        self.schema = schema
        self._elem_kind = "str"  # element kind of the last-compiled arr

    # --- coercion helpers (the NERD truth table) ---

    def as_num(self, col: Column, kind: str) -> Column:
        """Arithmetic operand: None->0, non-number->1 (tags.py:550-563)."""
        if kind == "num":
            return F.coalesce(col.cast("double"), F.lit(0.0))
        if kind == "bool":
            return F.coalesce(col.cast("int").cast("double"), F.lit(0.0))
        if kind == "null":
            return F.lit(0.0)
        # string/array: present -> 1, missing -> 0
        return F.when(col.isNull(), 0.0).otherwise(1.0)

    def as_bool(self, col: Column, kind: str) -> Column:
        """Truthiness: None/False/0/''/[] -> False (tags.py:957-971)."""
        if kind == "bool":
            return F.coalesce(col, F.lit(False))
        if kind == "num":
            return F.coalesce(col.cast("double") != 0.0, F.lit(False))
        if kind == "arr":
            return F.coalesce(F.size(col) > 0, F.lit(False))
        if kind == "null":
            return F.lit(False)
        return F.coalesce(F.length(col) > 0, F.lit(False))

    # --- compile ---

    def compile(self, node) -> tuple[Column, str]:
        if isinstance(node, Lit):
            if node.value is None:
                return F.lit(None), "null"
            kind = (
                "bool"
                if isinstance(node.value, bool)
                else "num"
                if isinstance(node.value, (int, float))
                else "str"
            )
            return F.lit(node.value), kind

        if isinstance(node, ListLit):
            pairs = [self.compile(i) for i in node.items]
            kinds = {k for _, k in pairs}
            self._elem_kind = pairs[0][1] if len(kinds) == 1 and pairs else "str"
            return F.array(*[c for c, _ in pairs]), "arr"

        if isinstance(node, Attr):
            dtype = _resolve_path(self.schema, node.path)
            if dtype is None:
                # unknown attribute == record field absent -> None
                return F.lit(None), "null"
            if isinstance(dtype, T.ArrayType):
                self._elem_kind = _elem_kind_of(dtype.elementType)
            return F.col(node.path), _field_kind(dtype)

        if isinstance(node, JPath):
            return self._jsonpath(node.expr)

        if isinstance(node, Unary):  # not
            c, k = self.compile(node.operand)
            return ~self.as_bool(c, k), "bool"

        if isinstance(node, Binary):
            return self._binary(node)

        raise TypeError(f"unknown AST node {node!r}")

    def _empty_arr(self) -> Column:
        self._elem_kind = "str"
        return F.array().cast("array<string>")

    def _jsonpath(self, expr: str) -> tuple[Column, str]:
        """Compile a backtick JSONPath to an array Column — the list of
        matches, like the reference's jsonpath find (tags.py:477-492):
        a missing path yields the EMPTY list (never None), so math
        coercion gives 1 and truthiness gives False, exactly as the
        interpreter's [] does (:957-971 with evaluate_mathematical).

        Supported grammar (covers the shipped configs, e.g.
        etc/tags.yml:172,178 ``'white' in `$.misp_events[*].tlp```):
        ``$.a.b`` scalar path → 0/1-element list; ``$.a[*]`` array
        projection; ``$.a.b[*].c.d`` field extraction across an array
        (elements whose field is null are dropped — jsonpath only
        returns existing values).
        """
        if not re.fullmatch(r"\$(?:\.\w+|\[\*\])*", expr):
            raise ValueError(f"tags DSL: unsupported JSONPath {expr!r}")
        segs = re.findall(r"\.(\w+)|\[(\*)\]", expr)
        segs = [name or star for name, star in segs]
        if segs.count("*") > 1:
            raise ValueError(f"tags DSL: nested [*] unsupported in {expr!r}")
        cur: T.DataType = self.schema
        col: Column | None = None
        i = 0
        # struct-field prefix up to the first [*]
        while i < len(segs) and segs[i] != "*":
            name = segs[i]
            if not (isinstance(cur, T.StructType) and name in cur.fieldNames()):
                return self._empty_arr(), "arr"
            cur = cur[name].dataType
            col = F.col(".".join(segs[: i + 1]))
            i += 1
        if i == len(segs):  # scalar path -> list of 0/1 matches
            if col is None:
                return self._empty_arr(), "arr"
            self._elem_kind = _elem_kind_of(cur)
            return (
                F.when(col.isNotNull(), F.array(col)).otherwise(
                    F.array().cast(T.ArrayType(cur))
                ),
                "arr",
            )
        # the [*] projection
        if not isinstance(cur, T.ArrayType) or col is None:
            return self._empty_arr(), "arr"
        elem_type = cur.elementType
        suffix = segs[i + 1 :]
        if "*" in suffix:
            raise ValueError(f"tags DSL: nested [*] unsupported in {expr!r}")
        # validate the suffix against the element type
        for name in suffix:
            if not (
                isinstance(elem_type, T.StructType)
                and name in elem_type.fieldNames()
            ):
                return self._empty_arr(), "arr"
            elem_type = elem_type[name].dataType

        def extract(x: Column) -> Column:
            for name in suffix:
                x = x[name]
            return x

        out = F.filter(
            F.transform(col, extract) if suffix else col,
            lambda x: x.isNotNull(),
        )
        self._elem_kind = _elem_kind_of(elem_type)
        return F.coalesce(out, F.array().cast(T.ArrayType(elem_type))), "arr"

    def _binary(self, node: Binary) -> tuple[Column, str]:
        op = node.op
        if op in ("and", "or"):
            lc, lk = self.compile(node.left)
            rc, rk = self.compile(node.right)
            lb, rb = self.as_bool(lc, lk), self.as_bool(rc, rk)
            return (lb & rb) if op == "and" else (lb | rb), "bool"

        if op in ("+", "-", "*", "/"):
            lc, lk = self.compile(node.left)
            rc, rk = self.compile(node.right)
            ln, rn = self.as_num(lc, lk), self.as_num(rc, rk)
            if op == "+":
                return ln + rn, "num"
            if op == "-":
                return ln - rn, "num"
            if op == "*":
                return ln * rn, "num"
            # zero-division -> 0 (tags.py:571-575)
            return F.when(rn == 0.0, 0.0).otherwise(ln / rn), "num"

        if op == "in":
            # right side first: every arr producer records its element
            # kind in self._elem_kind as it returns (single-level —
            # no operator yields an array, so nothing overwrites it)
            rc, rk = self.compile(node.right)
            ek = self._elem_kind if rk == "arr" else None
            lc, lk = self.compile(node.left)
            if rk != "arr":
                return F.lit(False), "bool"
            # comparability guard (ADVICE r02): an ill-typed
            # array_contains raises AnalysisException at compile time,
            # where the reference interpreter degrades the mismatch to
            # False. bool/num are mutually comparable (True == 1).
            if lk == "bool" and ek == "num":
                lc, lk = lc.cast("int"), "num"
            elif lk == "num" and ek == "bool":
                rc = F.transform(rc, lambda x: x.cast("int"))
                ek = "num"
            if lk != ek or lk not in ("num", "str", "bool"):
                return F.lit(False), "bool"
            return F.coalesce(F.array_contains(rc, lc), F.lit(False)), "bool"

        if op == "matches":
            lc, lk = self.compile(node.left)
            rc, rk = self.compile(node.right)
            if lk == "null":
                return F.lit(False), "bool"
            return F.coalesce(F.regexp_like(lc, rc), F.lit(False)), "bool"

        # comparisons: mismatched/None comparisons -> False
        lc, lk = self.compile(node.left)
        rc, rk = self.compile(node.right)
        # bool and num are mutually comparable (Python: True == 1);
        # cast the bool side to int so `flag == 1` behaves as the
        # reference interpreter does, not as lit(False)
        if {lk, rk} == {"bool", "num"}:
            if lk == "bool":
                lc, lk = lc.cast("int"), "num"
            else:
                rc, rk = rc.cast("int"), "num"
        comparable = {lk, rk} <= {"num"} or {lk, rk} <= {"str"} or {lk, rk} <= {"bool"}
        if not comparable:
            # NERD: comparison raising (type mismatch / None) -> False;
            # == / != against None-typed operands follow Python equality
            if lk == "null" or rk == "null":
                if node.op == "==":
                    return lc.isNull() & rc.isNull(), "bool"
                if node.op == "!=":
                    return ~(lc.isNull() & rc.isNull()), "bool"
            return F.lit(False), "bool"
        cmp = {
            "==": lc == rc,
            "!=": lc != rc,
            "<": lc < rc,
            "<=": lc <= rc,
            ">": lc > rc,
            ">=": lc >= rc,
        }[node.op]
        return F.coalesce(cmp, F.lit(False)), "bool"


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def condition_column(cond: str, df: DataFrame) -> Column:
    """Compile a DSL condition to a boolean Column over df's schema."""
    comp = Compiler(df.schema)
    col, kind = comp.compile(parse(cond))
    return comp.as_bool(col, kind)


def confidence_column(cond: str, df: DataFrame) -> Column:
    """Confidence: the condition's numeric value when the expression
    is numeric, else 1.0/0.0 by truthiness (tags.py:973-989)."""
    comp = Compiler(df.schema)
    col, kind = comp.compile(parse(cond))
    if kind == "num":
        return F.coalesce(col.cast("double"), F.lit(0.0))
    return F.when(comp.as_bool(col, kind), 1.0).otherwise(0.0)


def interpolate_info(template: str, df: DataFrame) -> Column:
    """'{attr}'-interpolated info strings (tags.py grammar) -> concat."""
    parts: list[Column] = []
    for piece in re.split(r"(\{[^}]+\})", template):
        if piece.startswith("{") and piece.endswith("}"):
            parts.append(F.col(piece[1:-1]).cast("string"))
        elif piece:
            parts.append(F.lit(piece))
    return F.concat(*parts) if parts else F.lit("")


def tag_table(
    df: DataFrame, tags_config: dict[str, dict], entity_col: str = "entity"
) -> DataFrame:
    """Apply a tag config {name: {condition, info?}} to a profile
    table -> rows (entity, tag, confidence, info) for firing tags
    (reference shape: etc/tags.yml:46-80 + tags.py:199-229)."""
    outs = []
    for name, spec in sorted(tags_config.items()):
        cond = condition_column(spec["condition"], df)
        conf = confidence_column(spec.get("confidence", spec["condition"]), df)
        info = (
            interpolate_info(spec["info"], df) if "info" in spec else F.lit(None).cast("string")
        )
        outs.append(
            df.filter(cond).select(
                F.col(entity_col),
                F.lit(name).alias("tag"),
                F.round(conf, 6).alias("confidence"),
                info.alias("info"),
            )
        )
    if not outs:
        # empty config -> empty table with the contract schema
        schema = T.StructType(
            [
                T.StructField("entity", df.schema[entity_col].dataType),
                T.StructField("tag", T.StringType()),
                T.StructField("confidence", T.DoubleType()),
                T.StructField("info", T.StringType()),
            ]
        )
        return df.sparkSession.createDataFrame([], schema)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
