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


# r8 findings on the extended set's concurrency (PLANS.md):
# - FAIR mode with no pools file puts every job in the default pool,
#   whose INTERNAL order is FIFO — per-thread pools are required for
#   actual cross-query fair sharing (+0.2x measured);
# - submission order matters: longest-processing-time-first stops the
#   funnels from starting last and dangling past everyone (+0.1x);
# - the heavy funnels get weighted pools (weight/minShare) so their
#   critical path runs near-solo while short queries fill the slack;
# - the remaining gap to the absolute ceiling (sequential_total /
#   longest-query-solo-latency ~= 3.0x here) is non-preemptive FAIR
#   slot waits plus driver-side GIL contention across 8 submitter
#   threads building plans at once — the deployment answer for
#   multi-tenant serving is separate driver processes (Spark
#   Connect), which this single-process harness deliberately bounds.
_POOL_XML = """<?xml version="1.0"?>
<allocations>
  <pool name="heavy"><schedulingMode>FAIR</schedulingMode>
    <weight>6</weight><minShare>24</minShare></pool>
  <pool name="mid"><schedulingMode>FAIR</schedulingMode>
    <weight>3</weight><minShare>8</minShare></pool>
</allocations>
"""

_HEAVY = {"corpus_curation_v3": "heavy", "corpus_curation_v2": "mid",
          "dedup_best_of_cluster": "mid"}

# longest-first submission order (solo latencies at sf0.1)
_LPT = [
    "corpus_curation_v3", "corpus_curation_v2", "dedup_best_of_cluster",
    "text_span_dedup", "tfidf_top_terms", "dedup_incremental",
    "lm_unigram_logprob", "quality_model_filter", "shard_assign",
    "mixture_sample",
]


def run_one(spark, name, data_dir, pool=None):
    from nerd_spark.queries import REGISTRY

    if pool is not None:
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
    t0 = time.perf_counter()
    REGISTRY[name](spark, data_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    threads = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from nerd_spark.session import get_spark, read_table
    from nerd_spark.sources.layout import optimize_layout

    import tempfile

    pool_file = tempfile.NamedTemporaryFile(
        "w", suffix=".xml", delete=False
    )
    pool_file.write(_POOL_XML)
    pool_file.close()
    # FAIR scheduling so a long query (dedup) doesn't starve the
    # short ones behind it in the job queue
    spark = get_spark(
        app_name="nerd_spark_bench_concurrent",
        extra_conf={
            "spark.scheduler.mode": "FAIR",
            "spark.scheduler.allocation.file": pool_file.name,
        },
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

        order = _LPT if label == "extended" else list(names)
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=threads) as ex:
            list(
                ex.map(
                    lambda e: run_one(
                        spark, e[1], opt, pool=_HEAVY.get(e[1], f"p{e[0]}")
                    ),
                    enumerate(order),
                )
            )
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
