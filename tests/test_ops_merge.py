"""Op-algebra tests (SURVEY §2.4 semantics; FIXTURES.md §7 musts)."""

from __future__ import annotations

import json

from nerd_spark.operators.merge import apply_op, fold_ops, merge_changelog


def test_set_autocreates_parents():
    rec = {}
    apply_op(rec, "set", "a.b.c", {"value": 5})
    assert rec == {"a": {"b": {"c": 5}}}


def test_append_and_sets():
    rec = {}
    apply_op(rec, "append", "xs", {"value": 1})
    apply_op(rec, "append", "xs", {"value": 1})
    apply_op(rec, "add_to_set", "xs", {"value": 1})
    apply_op(rec, "add_to_set", "xs", {"value": 2})
    apply_op(rec, "extend_set", "xs", {"value": [2, 3, 4]})
    apply_op(rec, "rem_from_set", "xs", {"value": [1, 4]})
    assert rec["xs"] == [2, 3]


def test_add_sub_max_min():
    rec = {}
    apply_op(rec, "add", "n", {"value": 3})
    apply_op(rec, "add", "n", {"value": 4})
    apply_op(rec, "sub", "n", {"value": 2})
    apply_op(rec, "setmax", "mx", {"value": 10})
    apply_op(rec, "setmax", "mx", {"value": 7})
    apply_op(rec, "setmin", "mn", {"value": 10})
    apply_op(rec, "setmin", "mn", {"value": 7})
    assert (rec["n"], rec["mx"], rec["mn"]) == (5, 10, 7)


def test_remove_then_set_order_dependence():
    rec = {"a": {"b": 1}}
    apply_op(rec, "remove", "a", {})
    assert "a" not in rec
    apply_op(rec, "set", "a.c", {"value": 2})
    assert rec == {"a": {"c": 2}}


def test_next_step():
    # next slot after minimum, aligned to base+k*step
    rec = {}
    apply_op(rec, "next_step", "t", {"base": 100, "minimum": 130, "step": 20})
    assert rec["t"] == 140


def test_array_upsert_match_vs_insert():
    rec = {"events": [{"date": "2024-01-01", "cat": "scan", "n": 1}]}
    # match existing element -> increment in place
    apply_op(
        rec,
        "array_upsert",
        "events",
        {"query": {"date": "2024-01-01", "cat": "scan"}, "ops": [["add", "n", {"value": 2}]]},
    )
    assert rec["events"] == [{"date": "2024-01-01", "cat": "scan", "n": 3}]
    # no match -> insert query as new element, then apply ops
    apply_op(
        rec,
        "array_upsert",
        "events",
        {"query": {"date": "2024-01-02", "cat": "scan"}, "ops": [["add", "n", {"value": 1}]]},
    )
    assert rec["events"][1] == {"date": "2024-01-02", "cat": "scan", "n": 1}


def test_array_update_noop_when_absent():
    rec = {"events": [{"date": "d1", "n": 1}]}
    apply_op(
        rec,
        "array_update",
        "events",
        {"query": {"date": "d9"}, "ops": [["add", "n", {"value": 5}]]},
    )
    assert rec["events"] == [{"date": "d1", "n": 1}]


def test_array_update_first_match_only():
    rec = {"xs": [{"k": 1, "n": 0}, {"k": 1, "n": 0}]}
    apply_op(
        rec, "array_update", "xs", {"query": {"k": 1}, "ops": [["add", "n", {"value": 1}]]}
    )
    assert rec["xs"] == [{"k": 1, "n": 1}, {"k": 1, "n": 0}]


def test_array_remove_first_match():
    rec = {"xs": [{"k": 1}, {"k": 2}, {"k": 1}]}
    apply_op(rec, "array_remove", "xs", {"query": {"k": 1}})
    assert rec["xs"] == [{"k": 2}, {"k": 1}]


def test_weak_ops_never_create():
    out = fold_ops(None, [("*add", "n", {"value": 1})], eid="e1")
    assert out is None
    # one strong op in the batch -> record created, weak ops then apply
    out = fold_ops(
        None, [("*add", "n", {"value": 1}), ("set", "x", {"value": 2})], eid="e1"
    )
    assert out["n"] == 1 and out["x"] == 2 and out["_id"] == "e1"


def test_new_stamps_and_delete():
    out = fold_ops(None, [("set", "x", {"value": 1})], eid="e9", now="2024-01-01T00:00:00")
    assert out["_id"] == "e9" and out["ts_added"] == out["ts_last_update"]
    out = fold_ops(out, [("!DELETE", "", {})], eid="e9")
    assert out is None


def test_merge_changelog_distributed(spark):
    entities = spark.createDataFrame(
        [("a", json.dumps({"_id": "a", "n": 10, "tags": ["x"]}))],
        "eid string, record string",
    )
    ops = [
        # existing entity: increment + add_to_set
        (1, "a", "add", "n", json.dumps({"value": 5})),
        (2, "a", "add_to_set", "tags", json.dumps({"value": "y"})),
        (3, "a", "add_to_set", "tags", json.dumps({"value": "x"})),
        # new entity: created by strong op; order matters (set after add)
        (4, "b", "add", "n", json.dumps({"value": 1})),
        (5, "b", "set", "n", json.dumps({"value": 99})),
        # weak-only ops on absent entity: must NOT create
        (6, "c", "*add", "n", json.dumps({"value": 1})),
        # array upsert path
        (
            7,
            "a",
            "array_upsert",
            "events",
            json.dumps(
                {"query": {"date": "2024-01-01"}, "ops": [["add", "n", {"value": 1}]]}
            ),
        ),
    ]
    changelog = spark.createDataFrame(
        ops, "seq long, eid string, op string, key string, params string"
    )
    out = {
        r.eid: json.loads(r.record)
        for r in merge_changelog(entities, changelog).collect()
    }
    assert set(out) == {"a", "b"}
    assert out["a"]["n"] == 15
    assert out["a"]["tags"] == ["x", "y"]
    assert out["a"]["events"] == [{"date": "2024-01-01", "n": 1}]
    assert out["b"]["n"] == 99


def test_merge_changelog_delete_and_passthrough(spark):
    entities = spark.createDataFrame(
        [
            ("a", json.dumps({"_id": "a", "n": 1})),
            ("keep", json.dumps({"_id": "keep", "n": 7})),
        ],
        "eid string, record string",
    )
    changelog = spark.createDataFrame(
        [(1, "a", "!DELETE", "", "{}")],
        "seq long, eid string, op string, key string, params string",
    )
    out = {r.eid: json.loads(r.record) for r in merge_changelog(entities, changelog).collect()}
    assert set(out) == {"keep"}
    assert out["keep"]["n"] == 7


def test_next_step_key_base_from_record():
    # reference reads base from the record itself (update_manager.py:174-179)
    rec = {"sched": {"base": 100}}
    apply_op(
        rec, "next_step", "t", {"key_base": "sched.base", "minimum": 130, "step": 20}
    )
    assert rec["t"] == 140
    # key_base MUST exist in the record
    import pytest as _pytest

    with _pytest.raises(KeyError):
        apply_op(rec, "next_step", "t", {"key_base": "nosuch", "minimum": 1, "step": 1})


def test_merge_changelog_untouched_stay_jvm_side(spark):
    """The O(changed-keys) plan: untouched entities pass through via
    anti-join; only changelog keys enter the Python cogroup."""
    import json as _json

    entities = spark.createDataFrame(
        [(f"e{i}", _json.dumps({"_id": f"e{i}", "v": i})) for i in range(50)],
        "eid string, record string",
    )
    changelog = spark.createDataFrame(
        [(1, "e3", "add", "v", _json.dumps({"value": 100}))],
        "seq long, eid string, op string, key string, params string",
    )
    out = merge_changelog(entities, changelog)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftAnti" in plan and "LeftSemi" in plan
    rows = {r.eid: _json.loads(r.record) for r in out.collect()}
    assert len(rows) == 50 and rows["e3"]["v"] == 103
    # untouched record strings are byte-identical (no re-serialization)
    assert rows["e7"] == {"_id": "e7", "v": 7}
