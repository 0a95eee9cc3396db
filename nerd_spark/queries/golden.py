"""Self-oracle goldens: pinned-seed expected outputs for queries with
no closed-form SQL oracle.

Six queries are seed-deterministic but not SQL-expressible — the ANN
family with iterative (Lloyd) training (`ann_ivf_trained`,
`ann_pq_topk`, `ann_ivfpq_indexed`), the boosted-tree scorer
(`fmp_score_gbt`), the general-temperature mixture whose
``pow(p, 1/T)`` is libm-dependent at the last ulp
(`mixture_temperature_free`), and the HLL approximate-distinct
(`a2_window_totals_approx`, sketch values are engine-specific by
design). Leaving them "rows-only" forever is a hole in the hash gate:
a regression in the trained path would go unnoticed.

The fix (r8, per the r7 verdict): each query's output at the pinned
seed and the driver's correctness scale (sf0.01) is committed as a
golden expectation under ``goldens/<name>.json``, and
:func:`golden_oracle` re-expresses it as a DuckDB ``VALUES`` table so
the driver's ordinary rows/schema/hash compare covers it. The golden
is an *engine self-oracle*: it pins replay determinism (same seed,
same data -> bit-identical output), not independent semantics — the
semantic floor is held separately by the in-path recall asserts
(:func:`nerd_spark.queries.dataprep._assert_recall_floor`) and the
pytest properties (rerank >= corpus == bit-equal brute force, GBT
AUC, mixture rate algebra).

Scale guard: a golden is only meaningful against the exact dataset it
was captured on, so the emitted SQL carries a cardinality guard
(``WHERE (SELECT count(*) FROM <table>) = <n>``). On any other input
the oracle returns zero rows and the driver records a loud
rows-mismatch instead of a silent false pass. Regenerate with
``python audits/make_goldens.py`` after any intentional change to a
covered query (the diff shows up in git, where it belongs).
"""

from __future__ import annotations

import json
import os

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _lit(v, typ: str) -> str:
    if v is None:
        return "NULL"
    if typ == "str":
        return "'" + str(v).replace("'", "''") + "'"
    if typ == "float":
        # repr round-trips the double exactly; DuckDB parses the
        # decimal literal back to the identical bits
        return repr(float(v))
    return str(int(v))


def golden_queries() -> dict[str, str]:
    """name -> sf_dir the golden was captured on (for test skips:
    the VALUES oracle only applies to that exact dataset)."""
    out = {}
    if not os.path.isdir(GOLDEN_DIR):
        return out
    for fn in os.listdir(GOLDEN_DIR):
        if fn.endswith(".json"):
            with open(os.path.join(GOLDEN_DIR, fn)) as f:
                g = json.load(f)
            out[g["query"]] = g["sf_dir"]
    return out


def golden_oracle(name: str) -> str | None:
    """VALUES-table oracle SQL from a committed golden, or None when
    no golden has been captured yet (query stays rows-only)."""
    path = os.path.join(GOLDEN_DIR, name + ".json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        g = json.load(f)
    cols = g["columns"]
    types = g["types"]
    rows = ",\n".join(
        "(" + ", ".join(_lit(v, t) for v, t in zip(row, types)) + ")"
        for row in g["rows"]
    )
    guard = g["guard"]
    # explicit casts: DuckDB types a bare decimal literal in VALUES as
    # DECIMAL, whose canonical string form diverges from a double's
    # for integral values ('1.0' vs '1') — cast every column to the
    # captured type so the compare sees real doubles/bigints
    sql_t = {"float": "DOUBLE", "int": "BIGINT", "str": "VARCHAR"}
    proj = ", ".join(
        f"CAST({c} AS {sql_t[t]}) AS {c}" for c, t in zip(cols, types)
    )
    return (
        f"SELECT {proj} FROM (VALUES\n{rows}\n) AS g({', '.join(cols)})\n"
        f"WHERE (SELECT count(*) FROM {guard['table']}) = {guard['count']}"
    )
