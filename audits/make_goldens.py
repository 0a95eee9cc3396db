#!/usr/bin/env python
"""Capture self-oracle goldens for the seed-deterministic rows-only
queries (see nerd_spark/queries/golden.py for the why).

Runs each covered query TWICE at the driver's correctness scale
(sf0.01) and refuses to write a golden whose two runs differ — a
non-deterministic query must never be pinned. Output:
nerd_spark/queries/goldens/<name>.json, committed to git.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_GOLDEN_SF", "/root/testdata/sf0.01")

# query -> cardinality-guard table (the golden only applies when this
# table has the captured row count — any other dataset makes the
# oracle return zero rows, a loud rows-mismatch)
COVERED = {
    "ann_ivf_trained": "embeddings",
    "ann_pq_topk": "embeddings",
    "ann_ivfpq_indexed": "embeddings",
    "fmp_score_gbt": "events",
    "mixture_temperature_free": "documents",
    "a2_window_totals_approx": "events",
}


def main() -> None:
    from nerd_spark.queries import REGISTRY
    from nerd_spark.queries.compare import normalize
    from nerd_spark.queries.golden import GOLDEN_DIR
    from nerd_spark.session import get_spark, read_table

    spark = get_spark(app_name="make_goldens")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, guard_table in COVERED.items():
        pdfs = [REGISTRY[name](spark, SF_DIR).toPandas() for _ in range(2)]
        a, b = (normalize(p) for p in pdfs)
        if not a.equals(b):
            raise SystemExit(f"{name}: two runs differ — refusing to pin")
        pdf = pdfs[0]
        types = []
        for dt in pdf.dtypes:
            s = str(dt)
            types.append(
                "float" if s.startswith("float") else
                "int" if s.startswith("int") else "str"
            )
        rows = []
        for rec in pdf.itertuples(index=False):
            row = []
            for v, t in zip(rec, types):
                if v is None or (isinstance(v, float) and v != v):
                    row.append(None)
                elif t == "int":
                    row.append(int(v))
                elif t == "float":
                    row.append(float(v))
                else:
                    row.append(str(v))
            rows.append(row)
        guard_n = read_table(spark, SF_DIR, guard_table).count()
        out = {
            "query": name,
            "sf_dir": SF_DIR,
            "guard": {"table": guard_table, "count": guard_n},
            "columns": list(pdf.columns),
            "types": types,
            "rows": rows,
        }
        path = os.path.join(GOLDEN_DIR, name + ".json")
        with open(path, "w") as f:
            json.dump(out, f, separators=(",", ":"))
            f.write("\n")
        print(f"{name}: {len(rows)} rows -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
