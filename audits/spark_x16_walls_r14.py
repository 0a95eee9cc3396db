#!/usr/bin/env python
"""Spark walls for HEADLINE + the replica-extra set on a prebuilt
replica dir (r14 measurement; mirrors bench.py's replica block).

Run: PYTHONPATH=/root/repo python audits/spark_x16_walls_r14.py <dir> [names...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import HEADLINE, REPLICA_EXTRA  # noqa: E402


def main():
    data_dir = sys.argv[1]
    names = sys.argv[2:] or (HEADLINE + REPLICA_EXTRA)
    from nerd_spark.queries import REGISTRY
    from nerd_spark.session import get_spark, read_table

    spark = get_spark(app_name="spark_x16_walls_r14")
    spark.range(1000).selectExpr("sum(id)").collect()
    for t in "lineitem orders customer nation region events documents embeddings".split():
        read_table(spark, data_dir, t).count()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"x16:{name}")
        t0 = time.perf_counter()
        REGISTRY[name](spark, data_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        out[name] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        print(name, out[name], flush=True)
    print(json.dumps({"total": round(sum(out.values()), 3), "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
