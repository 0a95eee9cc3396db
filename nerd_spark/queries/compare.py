"""Differential compare utility mirroring the driver's oracle check:
row count + column names + order-insensitive value comparison.
Used by tests/test_oracle_diff.py; exactness here predicts the
driver's CORRECTNESS hash check.
"""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)

    def canon(v):
        if v is None or v is pd.NaT:
            return ""
        if isinstance(v, float):
            if v != v:  # NaN
                return ""
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return repr(v)
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    out = df.map(canon)
    return out.sort_values(by=list(out.columns), ignore_index=True)


def diff(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> str | None:
    """None if equal; else a human-readable mismatch description."""
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return f"columns: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
    if len(spark_pdf) != len(oracle_pdf):
        return f"rowcount: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    neq = (a != b).any(axis=1)
    if neq.any():
        i = neq.idxmax()
        return (
            f"values differ at normalized row {i}:\n"
            f"  spark : {a.loc[i].to_dict()}\n"
            f"  oracle: {b.loc[i].to_dict()}"
        )
    return None
