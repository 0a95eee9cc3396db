#!/usr/bin/env python
"""Fold-slope scale point (PLANS.md "Fold-slope refresh" rows): build
an events-only N-replica of sf0.1, seed every serve table, fold a
1%-corpus batch that touches ALL date partitions and entity buckets,
then time the serve reads. Prints ONE JSON line.

The claim this pins: fold cost tracks per-fold job overheads +
touched-partition rewrites, NOT corpus size, and serve reads stay
scale-flat — the two properties that make the ingest-maintained serve
tier viable at 100 TB. Prior rows were measured with ad-hoc session
scripts (160x/320x); this script makes the measurement re-runnable so
a third point (640x) and future regressions are one command:

    python audits/fold_slope.py 640
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

# serve-tier queries timed after the fold (noop sink, warm best-of-2)
SERVES = [
    "funnel_stages",
    "cohort_retention",
    "hh_event_users",
    "hh_users_min_count",
    "top_frequent_users",
    "w1_topk",
    "quantile_event_values",
    "quantile_by_event_type",
    "a1_daily_rollup",
    "a2_window_totals",
    "op_merge_snapshot",
]


def _shift(ev, rcol, extra=0):
    """Replica key shifts (bench_scale.SHIFTS discipline): disjoint
    event ids and user ids per replica; ``extra`` offsets a fold
    batch's event ids past every seeded replica's block."""
    return (
        ev.withColumn(
            "event_id",
            F.col("event_id") + F.col(rcol) * F.lit(10**9) + F.lit(extra),
        )
        .withColumn("user_id", F.col("user_id") + F.col(rcol) * F.lit(10**4))
        .drop(rcol)
    )


def main() -> None:
    from nerd_spark.queries import REGISTRY
    from nerd_spark.session import get_spark, read_table
    from nerd_spark.sources.layout import (
        seed_value_hist,
        update_event_summaries,
        update_value_hist_summary,
    )

    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"fold_slope_{replicas}x")
    spark.range(1000).selectExpr("sum(id)").collect()
    d = tempfile.mkdtemp(prefix=f"nerd_fold_slope_{replicas}x_")

    ev = read_table(spark, src, "events")
    if "ts_ns" in ev.columns:
        ev = ev.drop("ts_ns")
    r = spark.range(replicas).withColumnRenamed("id", "_r")
    t0 = time.perf_counter()
    _shift(ev.crossJoin(r), "_r").repartition(64).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "events.parquet"))
    t_repl = round(time.perf_counter() - t0, 1)
    evd = read_table(spark, d, "events")
    n_events = evd.count()

    t0 = time.perf_counter()
    update_event_summaries(spark, d, evd, batch_id="seed")
    seed_value_hist(spark, d)
    t_seed = round(time.perf_counter() - t0, 1)

    # 1%-corpus batch: a 1% sample of the base table re-replicated, so
    # it lands on every replica's entity buckets and (nearly) every
    # date partition; fresh event ids keep the append disjoint.
    batch = _shift(ev.sample(0.01, seed=7).crossJoin(r), "_r", extra=5 * 10**8)
    batch.write.mode("append").parquet(os.path.join(d, "events.parquet"))
    n_batch = batch.count()
    t0 = time.perf_counter()
    update_event_summaries(spark, d, batch, batch_id="b1")
    update_value_hist_summary(spark, d, batch, batch_id="b1")
    t_fold = round(time.perf_counter() - t0, 1)

    serves = {}
    for name in SERVES:
        fn = REGISTRY[name]
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        serves[name] = round(best, 3)

    print(
        json.dumps(
            {
                "metric": "fold_slope",
                "replicas": replicas,
                "events": n_events,
                "batch_rows": n_batch,
                "replicate_sec": t_repl,
                "seed_sec": t_seed,
                "fold_sec": t_fold,
                "serves": serves,
                "dir": d,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
