#!/usr/bin/env python
"""Correct interleaved A/B for the r13 _pair_jaccard over-verdict
pass-through (the first harness compared the registered query — which
at sf0.1 rides the full-recompute path — against a direct indexed
call; invalid). Here BOTH sides call incremental_minhash_pairs_indexed
directly on the same inputs at a 16x-replica corpus (the scale where
the registered gate actually chooses the indexed path).

Usage: PYTHONPATH=/root/repo python audits/ab_r13_incr_probe.py [reps] [replicas]
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_old_dedup(rev: str):
    src = subprocess.check_output(
        ["git", "-C", os.path.join(os.path.dirname(__file__), ".."),
         "show", f"{rev}:nerd_spark/operators/dedup.py"],
        text=True,
    )
    path = os.path.join(tempfile.mkdtemp(prefix="old_dedup_"), "old_dedup.py")
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("old_dedup", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def canary():
    t0 = time.monotonic()
    x = 0
    for i in range(2_000_000):
        x += i * i
    return time.monotonic() - t0


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    from pyspark.sql import functions as F

    from nerd_spark.operators import dedup as DD
    from nerd_spark.session import get_spark, read_table

    old = load_old_dedup("HEAD")
    spark = get_spark(app_name="ab_r13_incr_probe")
    print(f"canary pre: {canary():.3f}s", flush=True)

    base = read_table(spark, "/root/testdata/sf0.1", "documents")
    n = base.agg(F.max("doc_id")).first()[0] + 1
    r = spark.range(replicas).withColumnRenamed("id", "_r")
    docs = (
        base.crossJoin(r)
        .withColumn("doc_id", F.col("doc_id") + F.col("_r") * n)
        .drop("_r")
        .localCheckpoint()
    )
    print(f"replica corpus: {docs.count()} docs", flush=True)
    bands = DD.minhash_band_table(
        DD.shingle_arrays(DD._spread(docs), "doc_id", "text", 3)
    ).localCheckpoint()
    print(f"bands: {bands.count()} rows", flush=True)
    batch = lambda c: c % 5 == 4  # noqa: E731

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def run(mod):
        noop(
            mod.incremental_minhash_pairs_indexed(docs, bands, batch).filter(
                F.col("jaccard") >= 0.5
            )
        )

    # parity check once: identical pair sets old vs new
    a = (
        old.incremental_minhash_pairs_indexed(docs, bands, batch)
        .filter(F.col("jaccard") >= 0.5)
    )
    b = (
        DD.incremental_minhash_pairs_indexed(docs, bands, batch)
        .filter(F.col("jaccard") >= 0.5)
    )
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"parity: symmetric diff rows = {diff}", flush=True)
    spark.catalog.clearCache()

    for mod, tag in ((old, "old"), (DD, "new")):
        run(mod)
        spark.catalog.clearCache()
    for rep in range(reps):
        order = [("old", old), ("new", DD)]
        if rep % 2:
            order.reverse()
        t = {}
        for tag, mod in order:
            spark.sparkContext.setJobDescription(f"incr_indexed {tag} rep{rep}")
            t0 = time.monotonic()
            run(mod)
            t[tag] = time.monotonic() - t0
            spark.catalog.clearCache()
        print(
            f"incr_indexed rep{rep}: old {t['old']:.2f}s new {t['new']:.2f}s",
            flush=True,
        )
    print(f"canary post: {canary():.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
