#!/usr/bin/env python
"""Serve-floor adjudication (r13 verdict #6): for the perf-weak serve
queries, decompose the engine wall into (JVM job-launch floor) +
(serve-table read) and show the raw recompute they replace — the
engine/DuckDB ratio on these is floor arithmetic (a 0.1-0.2 s JVM job
against a no-JVM comparator), not plan cost.

Run: PYTHONPATH=/root/repo python audits/serve_floor_adjudication_r14.py <opt_dir>
"""
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    data_dir = sys.argv[1]
    from nerd_spark.queries import ORACLE, REGISTRY
    from nerd_spark.session import get_spark

    spark = get_spark(app_name="serve_floor_adjudication")
    spark.range(1000).selectExpr("sum(id)").collect()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def med(fn, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return round(statistics.median(ts), 3)

    out = {"dir": data_dir}
    # (a) the bare JVM job-launch + noop-commit floor: the cheapest
    # possible action in this session — every query wall below
    # includes at least one of these
    out["jvm_noop_floor_sec"] = med(lambda: noop(spark.range(1)))
    from bench_duckdb import duck_connect

    duck = duck_connect(data_dir)
    for name in [
        "w1_topk",
        "a3_ewma",
        "a16_rollup_revenue",
        "hh_users_min_count",
        "hh_by_type_min_count",
    ]:
        fn = REGISTRY[name]
        fn(spark, data_dir).write.format("noop").mode("overwrite").save()  # warm
        out[name] = {
            "spark_warm_sec": med(lambda: noop(fn(spark, data_dir))),
            "duck_sec": med(lambda: duck.execute(ORACLE[name]).fetchall())
            if name in ORACLE
            else None,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
