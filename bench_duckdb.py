#!/usr/bin/env python
"""DuckDB comparator timing for the headline queries: runs each
query's oracle SQL over the same parquet dir and prints one JSON line
{"queries": {name: sec}, "value": total}. Used for the PLANS.md
engine-vs-comparator ratio at each scale point, and imported by
bench.py for the INTERLEAVED per-query ratios in the committed bench
row (same-window engine/duck is the only ratio that survives degraded
host windows — r12 verdict #3)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

from bench import HEADLINE  # noqa: E402


def duck_connect(data_dir: str) -> "duckdb.DuckDBPyConnection":
    """A DuckDB connection with every testdata table registered as a
    view over the SAME parquet files the engine reads — including the
    layout-optimized-dir shims (nanos-long ts)."""
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        path = f"{data_dir}/{name}.parquet"
        if os.path.isdir(path):  # spark-written directory of part files
            path = f"{path}/*.parquet"
        sel = f"SELECT * FROM '{path}'"
        if name == "events":
            cols = dict(
                (r[0], r[1])
                for r in con.execute(f"DESCRIBE {sel}").fetchall()
            )
            if cols.get("ts") == "BIGINT":
                # layout-optimized dirs keep the raw TIMESTAMP(NANOS)
                # value as a nanos long (see session.read_table) —
                # apply the same truncate-to-us shim DuckDB does when
                # reading the annotated original
                sel = (
                    f"SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) "
                    f"FROM '{path}'"
                )
        con.execute(f"CREATE VIEW {name} AS {sel}")
    return con


def main() -> None:
    data_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from nerd_spark.queries import ORACLE

    con = duck_connect(data_dir)
    timings = {}
    for name in HEADLINE:
        if name not in ORACLE:
            continue
        t0 = time.perf_counter()
        con.execute(ORACLE[name]).fetchall()
        timings[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"metric": "duckdb_comparator", "unit": "sec",
                      "value": round(sum(timings.values()), 3),
                      "queries": timings, "dir": data_dir}))


if __name__ == "__main__":
    main()
