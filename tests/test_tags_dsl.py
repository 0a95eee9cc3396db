"""Tags-DSL compiler tests against the reference coercion truth table
(SURVEY §2.9: None->0/False, non-number->1 in math, zero-div->0,
failed comparison->False, truthiness None/False/0/''/[]->False).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nerd_spark.plans.tags_dsl import (
    condition_column,
    confidence_column,
    interpolate_info,
    parse,
    tag_table,
)


@pytest.fixture(scope="module")
def profile(spark):
    return spark.createDataFrame(
        [
            # entity, rep, total, ctry, tags_list, hostname
            ("a", 0.9, 100, "CZ", ["ssh", "scan"], "srv.example.com"),
            ("b", 0.2, 5, "DE", [], None),
            ("c", None, None, None, None, "mail.test.org"),
        ],
        "entity string, rep double, total long, ctry string, "
        "tags_list array<string>, hostname string",
    )


def _eval(df, cond):
    return {
        r.entity: r.v
        for r in df.select("entity", condition_column(cond, df).alias("v")).collect()
    }


def _conf(df, cond):
    return {
        r.entity: r.v
        for r in df.select("entity", confidence_column(cond, df).alias("v")).collect()
    }


def test_comparisons_and_null_coercion(profile):
    # None comparison -> False (not NULL)
    assert _eval(profile, "rep > 0.5") == {"a": True, "b": False, "c": False}
    assert _eval(profile, "rep <= 0.5") == {"a": False, "b": True, "c": False}


def test_arithmetic_coercions(profile):
    # None -> 0 in math; string -> 1 in math
    assert _eval(profile, "rep + total > 100") == {"a": True, "b": False, "c": False}
    # ctry is a string: numeric coercion -> 1 when present, 0 when None
    assert _eval(profile, "ctry + 1 == 2") == {"a": True, "b": True, "c": False}


def test_zero_division(profile):
    # division by zero -> 0, not error/NULL  (c: total None -> 0)
    assert _eval(profile, "100 / total == 1") == {"a": True, "b": False, "c": False}
    assert _eval(profile, "100 / total == 0") == {"a": False, "b": False, "c": True}


def test_logic_and_truthiness(profile):
    # arrays: [] and None -> False; non-empty -> True
    assert _eval(profile, "tags_list") == {"a": True, "b": False, "c": False}
    assert _eval(profile, "not tags_list") == {"a": False, "b": True, "c": True}
    assert _eval(profile, "rep > 0.5 and total > 50") == {
        "a": True,
        "b": False,
        "c": False,
    }
    assert _eval(profile, "rep > 0.5 or ctry == 'DE'") == {
        "a": True,
        "b": True,
        "c": False,
    }


def test_in_and_matches(profile):
    assert _eval(profile, "ctry in ['CZ', 'SK']") == {"a": True, "b": False, "c": False}
    assert _eval(profile, "'ssh' in tags_list") == {"a": True, "b": False, "c": False}
    assert _eval(profile, "ctry not in ['CZ']") == {"a": False, "b": True, "c": True}
    assert _eval(profile, r"hostname matches '\.com$'") == {
        "a": True,
        "b": False,
        "c": False,
    }


def test_mismatched_comparison_is_false(profile):
    # comparing string to number raises in the reference -> False
    assert _eval(profile, "ctry > 5") == {"a": False, "b": False, "c": False}


def test_confidence_semantics(profile):
    # numeric expression -> its value; boolean -> 1/0
    assert _conf(profile, "rep * 0.5") == {"a": 0.45, "b": 0.1, "c": 0.0}
    assert _conf(profile, "total > 50") == {"a": 1.0, "b": 0.0, "c": 0.0}


def test_unknown_attr_is_none(profile):
    assert _eval(profile, "nosuch.attr > 1") == {"a": False, "b": False, "c": False}
    assert _eval(profile, "nosuch == null") == {"a": True, "b": True, "c": True}


def test_parse_precedence():
    ast = parse("a + b * 2 > 4 and not c == 1")
    assert ast.op == "and"


def test_tag_table(profile):
    cfg = {
        "highrep": {"condition": "rep > 0.5", "confidence": "rep", "info": "rep={rep}"},
        "quiet": {"condition": "not tags_list"},
    }
    rows = {(r.entity, r.tag): r for r in tag_table(profile, cfg).collect()}
    assert set(rows) == {("a", "highrep"), ("b", "quiet"), ("c", "quiet")}
    assert rows[("a", "highrep")].confidence == 0.9
    assert rows[("a", "highrep")].info == "rep=0.9"


def test_info_interpolation(spark, profile):
    col = interpolate_info("host {hostname} in {ctry}", profile)
    out = profile.select(col.alias("s")).collect()[0].s
    assert out == "host srv.example.com in CZ"


def test_empty_config_returns_typed_empty(profile):
    out = tag_table(profile, {})
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["entity", "tag", "confidence", "info"]


def test_bool_num_comparison(spark):
    # Python semantics: True == 1 -> True, False < 1 -> True (ADVICE r01)
    df = spark.createDataFrame(
        [("a", True), ("b", False), ("c", None)], "entity string, flag boolean"
    )
    assert _eval(df, "flag == 1") == {"a": True, "b": False, "c": False}
    assert _eval(df, "flag < 1") == {"a": False, "b": True, "c": False}
    assert _eval(df, "1 == flag") == {"a": True, "b": False, "c": False}


def test_jsonpath_list_semantics(spark):
    """Backtick JSONPath truth table (reference: tags.py:477-492
    JSONPathExpr returns the match list; :957-971 [] is falsy;
    Bop math coercion :550-563 gives any list -> 1)."""
    from nerd_spark.plans.tags_dsl import condition_column, confidence_column

    df = spark.createDataFrame(
        [
            (1, [("a", 1), ("b", 2)], 5),
            (2, [("c", 3)], 5),
            (3, [], 5),
        ],
        "id long, events array<struct<cat:string,n:long>>, x long",
    )

    def fire(cond):
        return {r.id for r in df.filter(condition_column(cond, df)).collect()}

    # membership over the projected list
    assert fire("'a' in `$.events[*].cat`") == {1}
    assert fire("'zz' in `$.events[*].cat`") == set()
    assert fire("'a' not in `$.events[*].cat`") == {2, 3}
    # list truthiness: empty -> False
    assert fire("`$.events[*]`") == {1, 2}
    assert fire("not `$.events[*].cat`") == {3}
    # scalar path -> 0/1-element list, truthy when present
    assert fire("`$.x`") == {1, 2, 3}
    assert fire("5 in `$.x`") == {1, 2, 3}
    # missing path -> empty list: falsy, but 1 in math (list -> 1)
    assert fire("`$.nope[*].y`") == set()
    conf = {
        r.id: r.c
        for r in df.select(
            "id", confidence_column("`$.events[*].cat` + 1", df).alias("c")
        ).collect()
    }
    assert conf == {1: 2.0, 2: 2.0, 3: 2.0}  # list -> 1 in arithmetic
    # comparison list vs scalar -> False (Python semantics)
    assert fire("`$.events[*].cat` == 1") == set()


def test_jsonpath_rejects_bad_paths(spark):
    from nerd_spark.plans.tags_dsl import parse, Compiler
    import pytest as _pytest
    from pyspark.sql import types as T

    comp = Compiler(T.StructType([]))
    with _pytest.raises(ValueError):
        comp.compile(parse("`events[*]`"))  # must start with $
    with _pytest.raises(ValueError):
        comp.compile(parse("`$.a[*].b[*]`"))  # nested [*] unsupported


def test_in_type_mismatch_degrades_to_false(spark):
    """Ill-typed `in` must compile to False, not AnalysisException —
    the reference interpreter degrades the mismatch (ADVICE r02)."""
    from nerd_spark.plans.tags_dsl import condition_column

    df = spark.createDataFrame(
        [
            (1, [("a", 1), ("b", 2)], [10, 20], [True]),
            (2, [], [], []),
        ],
        "id long, events array<struct<cat:string,n:long>>, "
        "nums array<bigint>, flags array<boolean>",
    )

    def fire(cond):
        return {r.id for r in df.filter(condition_column(cond, df)).collect()}

    # string literal vs numeric element type -> False everywhere
    assert fire("'x' in `$.events[*].n`") == set()
    assert fire("'x' in nums") == set()
    # numeric literal vs the array<string> empty fallback -> False
    assert fire("5 in `$.nope[*].y`") == set()
    # struct elements are never scalar-comparable
    assert fire("'a' in `$.events[*]`") == set()
    # bool/num remain mutually comparable (True == 1)
    assert fire("1 in flags") == {1}
    assert fire("true in nums") == set()  # 10,20 contain no 1
    # well-typed membership still works
    assert fire("10 in nums") == {1}
    assert fire("'a' in `$.events[*].cat`") == {1}
