#!/usr/bin/env python
"""Dump .explain("formatted") for a set of registered queries into
plans/<tag>/<query>_<suffix>.txt — the before/after plan evidence the
optimization rounds commit alongside bench numbers.

Usage:
  python audits/dump_plans.py <tag> <suffix> [query ...]
e.g.
  python audits/dump_plans.py r13 before q1_pricing_summary w1_topk

With no query list, dumps every bench.py HEADLINE + EXTENDED query.
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1);
SPARK_GRAFT_PLANS_LAYOUT=raw to skip the layout rewrite (default
builds the optimized layout exactly as bench.py does, so plans match
what the bench times).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import tempfile

    from bench import EXTENDED, HEADLINE
    from nerd_spark.queries import REGISTRY
    from nerd_spark.session import get_spark
    from nerd_spark.sources.layout import optimize_layout

    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or (HEADLINE + EXTENDED)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_root = os.path.join(os.path.dirname(__file__), "..", "plans", tag)
    os.makedirs(out_root, exist_ok=True)

    spark = get_spark(app_name="nerd_spark_dump_plans")
    data_dir = sf_dir
    if os.environ.get("SPARK_GRAFT_PLANS_LAYOUT", "optimized") != "raw":
        data_dir = tempfile.mkdtemp(prefix="nerd_spark_plans_layout_")
        optimize_layout(spark, sf_dir, data_dir)

    for name in names:
        df = REGISTRY[name](spark, data_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_root, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
