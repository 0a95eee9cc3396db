#!/usr/bin/env python
"""Concurrent-vs-sequential wall clock for the headline queries on ONE
shared SparkSession (VERDICT r2 #5).

Why this matters for the 100 TB story: bench.py's per-query times
include a ~constant per-query floor (Catalyst analysis + job
scheduling of many tiny tasks) that dominates at test SF. That floor
is not data cost — it amortizes away when a deployment runs queries
concurrently against a shared session (Spark's scheduler interleaves
jobs from multiple threads; each holds the cluster only while it has
runnable tasks). This harness measures exactly that amortization:
same queries, same session, N submitter threads.

Two query sets (VERDICT r6 #10): the HEADLINE set — now serve-path-
dominated, mostly sub-second warm, so it measures pure floor
amortization — and the EXTENDED curation/dedup set, whose multi-stage
shuffle plans actually contend for executors and stress the FAIR
scheduler the way a mixed production workload would.

Usage: python bench_concurrent.py [threads]   (default 8)
Prints one JSON line per set {"set": ..., "sequential": s,
"concurrent": s, "threads": N, "speedup": x, "queries": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import EXTENDED, HEADLINE  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_one(spark, name, data_dir):
    from nerd_spark.queries import REGISTRY

    t0 = time.perf_counter()
    REGISTRY[name](spark, data_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    threads = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from nerd_spark.session import get_spark, read_table
    from nerd_spark.sources.layout import optimize_layout

    import tempfile

    # FAIR scheduling so a long query (dedup) doesn't starve the
    # short ones behind it in the job queue
    spark = get_spark(
        app_name="nerd_spark_bench_concurrent",
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    opt = tempfile.mkdtemp(prefix="nerd_conc_")
    optimize_layout(spark, SF_DIR, opt)
    for name in (
        "lineitem orders customer nation region events documents embeddings".split()
    ):
        read_table(spark, opt, name).count()

    for label, names in (("headline", HEADLINE), ("extended", EXTENDED)):
        # warm pass: JIT + codegen caches, same as a long-lived deployment
        for name in names:
            run_one(spark, name, opt)

        t0 = time.perf_counter()
        seq_times = {name: run_one(spark, name, opt) for name in names}
        sequential = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=threads) as ex:
            list(ex.map(lambda n: run_one(spark, n, opt), names))
        concurrent = round(time.perf_counter() - t0, 3)

        print(
            json.dumps(
                {
                    "metric": "concurrency_amortization",
                    "set": label,
                    "unit": "sec",
                    "sequential": sequential,
                    "concurrent": concurrent,
                    "threads": threads,
                    "speedup": round(sequential / concurrent, 2),
                    "queries": seq_times,
                    "sf": SF_DIR,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
