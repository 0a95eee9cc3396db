"""Self-oracle golden plumbing (queries/golden.py): SQL emission,
escaping, NULLs, float round-trip, and the cardinality guard."""

from __future__ import annotations

import json
import os

import duckdb
import pytest

from nerd_spark.queries.golden import GOLDEN_DIR, golden_oracle, golden_queries


def _write_golden(tmp_path, monkeypatch, g):
    d = tmp_path / "goldens"
    d.mkdir(exist_ok=True)
    with open(d / (g["query"] + ".json"), "w") as f:
        json.dump(g, f)
    monkeypatch.setattr("nerd_spark.queries.golden.GOLDEN_DIR", str(d))


def test_values_sql_escaping_nulls_and_floats(tmp_path, monkeypatch):
    g = {
        "query": "t1",
        "sf_dir": "/x",
        "guard": {"table": "events", "count": 3},
        "columns": ["s", "f", "i"],
        "types": ["str", "float", "int"],
        "rows": [
            ["it's o''k", 0.1 + 0.2, 7],
            [None, None, None],
            ["plain", 1.0, -2],
        ],
    }
    _write_golden(tmp_path, monkeypatch, g)
    sql = golden_oracle("t1")
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM range(3)")
    rows = con.execute(sql).fetchall()
    assert rows[0][0] == "it's o''k"
    assert rows[0][1] == 0.1 + 0.2  # repr round-trips the exact double
    assert rows[1] == (None, None, None)
    assert rows[2] == ("plain", 1.0, -2)


def test_cardinality_guard_zeroes_rows_on_other_datasets(tmp_path, monkeypatch):
    g = {
        "query": "t2", "sf_dir": "/x",
        "guard": {"table": "events", "count": 999},
        "columns": ["i"], "types": ["int"], "rows": [[1], [2]],
    }
    _write_golden(tmp_path, monkeypatch, g)
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM range(3)")
    assert con.execute(golden_oracle("t2")).fetchall() == []


def test_missing_golden_returns_none():
    assert golden_oracle("no_such_query") is None


def test_committed_goldens_well_formed():
    """Every committed golden parses, declares a known shape, and is
    listed by golden_queries()."""
    listed = golden_queries()
    files = [f for f in os.listdir(GOLDEN_DIR) if f.endswith(".json")]
    assert len(files) == 6
    for fn in files:
        with open(os.path.join(GOLDEN_DIR, fn)) as f:
            g = json.load(f)
        assert g["query"] in listed
        assert set(g) >= {"query", "sf_dir", "guard", "columns", "types", "rows"}
        assert len(g["columns"]) == len(g["types"])
        assert g["rows"] and all(len(r) == len(g["columns"]) for r in g["rows"])
        assert golden_oracle(g["query"]) is not None
