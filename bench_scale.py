#!/usr/bin/env python
"""Two-point scaling curve: replicate the sf dir N× (key-shifted) and
run the same headline bench at both scale points.

Purpose (PLANS.md "Scaling curve"): separate Spark's fixed per-query
session floor from the data-dependent cost. If t(sf) ≈ c + m·rows,
then t(10×) − t(1×) ≈ 9·m·rows — the slope is the number that must
stay sane at 1000 executors, the constant amortizes away.

Usage: python bench_scale.py [replicas]   (default 10)
Prints one JSON line per scale point, same shape as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# key column shifts per replica (others copied verbatim; small dims
# nation/region/supplier/part stay 1x — they are broadcast sides)
SHIFTS = {
    "events": {"event_id": 10**9, "user_id": 10**4},
    "documents": {"doc_id": 10**7},
    "embeddings": {"vec_id": 10**6},
    "lineitem": {"l_orderkey": 10**9},
    "orders": {"o_orderkey": 10**9, "o_custkey": 10**7},
    "customer": {"c_custkey": 10**7},
}
COPY = ["nation", "region", "supplier", "part"]


def replicate(
    spark, src: str, dst: str, replicas: int, hot_keys: int = 0
) -> None:
    """hot_keys > 0 builds the deliberately-skewed variant: ~50% of
    all events are remapped onto `hot_keys` user ids (the scanners-
    hitting-every-sensor shape of security telemetry), the rest keep
    their replica-shifted ids. Used by --skew to measure that the
    salted rollup + AQE hold the aggregation families flat under a
    1%-of-keys-own-half-the-rows distribution."""
    from pyspark.sql import functions as F

    from nerd_spark.session import read_table

    for name in COPY:
        read_table(spark, src, name).write.mode("overwrite").parquet(
            f"{dst}/{name}.parquet"
        )
    for name, shifts in SHIFTS.items():
        df = read_table(spark, src, name)
        if "ts_ns" in df.columns:
            df = df.drop("ts_ns")
        parts = []
        for r in range(replicas):
            p = df
            for col, step in shifts.items():
                p = p.withColumn(col, F.col(col) + F.lit(r * step))
            if name == "documents" and r > 0:
                # keep replicas textually distinct — exact copies would
                # make every doc a 10-way near-duplicate and the dedup
                # measurement would time genuine quadratic OUTPUT
                # growth instead of scaling on 10x distinct docs.
                # A single appended marker token is NOT enough (r2 bug:
                # one extra token leaves shingle-Jaccard ~0.99, so the
                # 10x point timed 250k output pairs vs 256 at 1x); a
                # per-replica letter rotation rewrites nearly every
                # token, driving cross-replica Jaccard to ~0 while
                # preserving byte size and token count.
                alpha = "etaoinsrhl"
                rot = alpha[r % len(alpha):] + alpha[: r % len(alpha)]
                p = p.withColumn("text", F.translate("text", alpha, rot))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if name == "events" and hot_keys > 0:
            coin = F.pmod(F.hash("event_id"), F.lit(2)) == 0  # ~half the rows
            out = out.withColumn(
                "user_id",
                F.when(coin, F.pmod("user_id", F.lit(hot_keys))).otherwise(
                    F.col("user_id")
                ),
            )
        out.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")


def run_headline(spark, data_dir: str) -> dict[str, float]:
    from nerd_spark.queries import REGISTRY
    from nerd_spark.session import read_table

    for name in (
        "lineitem orders customer nation region events documents embeddings".split()
    ):
        read_table(spark, data_dir, name).count()
    timings = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        REGISTRY[name](spark, data_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def run_skew(spark, replicas: int) -> None:
    """--skew: same replica count twice — uniform keys vs 1% of keys
    owning ~50% of events — timing the aggregation family on the RAW
    (summary-free) path so the measurement exercises the shuffle agg
    itself, plus the explicit salted two-phase rollup
    (operators/skew.py). Healthy result: skewed/unskewed ≤ ~1.5×."""
    from pyspark.sql import functions as F

    from nerd_spark.operators.skew import salted_rollup
    from nerd_spark.queries import REGISTRY
    from nerd_spark.session import read_table

    n_users = read_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    hot = max(1, n_users * replicas // 100)  # 1% of the scaled key space

    dirs = {}
    for label, hk in (("uniform", 0), ("skewed", hot)):
        d = tempfile.mkdtemp(prefix=f"nerd_skew_{label}_{replicas}x_")
        replicate(spark, SF_DIR, d, replicas, hot_keys=hk)
        dirs[label] = d

    for label, d in dirs.items():
        ev = read_table(spark, d, "events")
        timings = {}
        for name in ("a1_daily_rollup", "a2_window_totals"):
            t0 = time.perf_counter()
            REGISTRY[name](spark, d).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        salted_rollup(
            ev.select("user_id", F.to_date("ts").alias("d"), "value"),
            ["user_id", "d"],
            sums=["value"],
        ).write.format("noop").mode("overwrite").save()
        timings["salted_rollup"] = round(time.perf_counter() - t0, 3)
        # heavy hitters IS the skew detector — on the skewed variant it
        # must return exactly the planted hot keys (count recorded).
        # The threshold derives from the planted-key count: hot keys
        # own share 0.5/hot each and cold keys ~1/(users*R), so
        # phi = 0.25/hot sits 2x under the hot share and ~25x over the
        # cold share AT ANY replica count — the r9 40x run exposed
        # that a fixed 0.1% threshold silently rises above the hot
        # share once 1% of the scaled key space exceeds 500 keys
        # (share 0.5/hot < phi -> zero found, a useless detector)
        from nerd_spark.operators.sketches import heavy_hitters

        phi = 0.25 / hot
        t0 = time.perf_counter()
        hh_rows = heavy_hitters(ev, "user_id", phi).count()
        timings["heavy_hitters"] = round(time.perf_counter() - t0, 3)
        found = hh_rows  # a COUNT — reported beside, never summed as seconds
        top = (
            ev.groupBy("user_id").count().orderBy(F.desc("count")).limit(1).first()
        )
        total = ev.count()
        print(json.dumps({
            "metric": "skew_bench", "variant": label, "replicas": replicas,
            "hot_keys": hot if label == "skewed" else 0,
            "hottest_key_share": round(top["count"] / total, 4),
            "value": round(sum(timings.values()), 3), "unit": "sec",
            "queries": timings, "heavy_hitters_found": found, "dir": d,
        }))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    replicas = int(args[0]) if args else 10
    from nerd_spark.session import get_spark
    from nerd_spark.sources.layout import optimize_layout

    spark = get_spark(app_name="nerd_spark_bench_scale")
    spark.range(1000).selectExpr("sum(id)").collect()

    if "--skew" in flags:
        run_skew(spark, replicas)
        spark.stop()
        return

    if "--skip-1x" not in flags:
        opt1 = tempfile.mkdtemp(prefix="nerd_scale_1x_")
        optimize_layout(spark, SF_DIR, opt1)
        t1 = run_headline(spark, opt1)
        print(json.dumps({"metric": "headline_total", "scale": "1x",
                          "value": round(sum(t1.values()), 3), "unit": "sec",
                          "queries": t1, "dir": opt1}))

    raw = tempfile.mkdtemp(prefix=f"nerd_scale_{replicas}x_raw_")
    replicate(spark, SF_DIR, raw, replicas)
    big = tempfile.mkdtemp(prefix=f"nerd_scale_{replicas}x_")
    # same ingest-time layout pass as the 1x point — otherwise the
    # replicated tables are N single-row-group files and the scan
    # parallelism comparison is apples-to-oranges
    optimize_layout(spark, raw, big, scale=replicas)
    tN = run_headline(spark, big)
    print(json.dumps({"metric": "headline_total", "scale": f"{replicas}x",
                      "value": round(sum(tN.values()), 3), "unit": "sec",
                      "queries": tN, "dir": big}))
    spark.stop()


if __name__ == "__main__":
    main()
