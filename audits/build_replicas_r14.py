#!/usr/bin/env python
"""Build the r14 measurement replica dirs (16x and 160x of sf0.1),
raw + optimized-layout, timing each phase. One-time tooling."""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench_scale import replicate
from nerd_spark.session import get_spark
from nerd_spark.sources.layout import optimize_layout

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="build_replicas_r14")
spark.range(1000).selectExpr("sum(id)").collect()
out = {}
for n in [int(a) for a in sys.argv[1:]] or [16, 160]:
    raw = f"/root/replicas/sf0.1_x{n}_raw"
    opt = f"/root/replicas/sf0.1_x{n}_opt"
    if not os.path.exists(os.path.join(raw, "documents.parquet")):
        t0 = time.perf_counter()
        replicate(spark, SF_DIR, raw, n)
        out[f"replicate_{n}x_sec"] = round(time.perf_counter() - t0, 1)
    if not os.path.exists(os.path.join(opt, "documents.parquet")):
        t0 = time.perf_counter()
        optimize_layout(spark, raw, opt, scale=n)
        out[f"layout_{n}x_sec"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out), flush=True)
spark.stop()
