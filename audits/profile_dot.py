#!/usr/bin/env python
"""A/B the cosine dot-product kernels on the real embeddings table:
interpreted HOF fold (zip_with+aggregate) vs codegen'd unrolled
element_at chain (guarded by exact-length equality). Checks BIT
equality of the resulting sims on the full cross join, then times
both shapes interleaved (median of N) at a replicated scale.

Usage: python audits/profile_dot.py [sf_dir] [replicas]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from nerd_spark.operators import similarity as S  # noqa: E402
from nerd_spark.session import get_spark, read_table  # noqa: E402


def unrolled_dot(a, b, dim):
    s = None
    for i in range(1, dim + 1):
        p = F.element_at(a, i) * F.element_at(b, i)
        s = p if s is None else s + p
    return s


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    dim = 64
    spark = get_spark(app_name="profile_dot")
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    big = emb
    for i in range(1, replicas):
        big = big.unionByName(
            emb.select((F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"), "v")
        )
    big = big.repartition(32).localCheckpoint()
    n = big.count()
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )

    pairs = big.crossJoin(F.broadcast(q))

    def fold_sims():
        return pairs.select(
            "vec_id", "qid", S.dot(F.col("v"), F.col("qv")).alias("d")
        )

    def unrolled_sims():
        d = unrolled_dot(F.col("v"), F.col("qv"), dim)
        guard = (F.size("v") == dim) & (F.size("qv") == dim)
        return pairs.select(
            "vec_id",
            "qid",
            F.when(guard, d).otherwise(S.dot(F.col("v"), F.col("qv"))).alias("d"),
        )

    # --- bit equality on the raw (unreplicated) cross join ---
    small_pairs = emb.crossJoin(F.broadcast(q))
    a = small_pairs.select(
        "vec_id", "qid", S.dot(F.col("v"), F.col("qv")).alias("d")
    )
    d2 = unrolled_dot(F.col("v"), F.col("qv"), dim)
    b = small_pairs.select("vec_id", "qid", d2.alias("d"))
    diff = (
        a.alias("x")
        .join(b.alias("y"), ["vec_id", "qid"])
        .filter(
            # bit-level: double -> long bits via unscaled comparison
            F.expr("cast(x.d as string)") != F.expr("cast(y.d as string)")
        )
        .count()
    )
    print(f"string-repr mismatches on {emb.count() * 10} pairs: {diff}")

    def timed(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    ft, ut = [], []
    for _ in range(5):
        ft.append(timed(fold_sims()))
        ut.append(timed(unrolled_sims()))
    print(f"rows={n} pairs={n*10}")
    print(f"fold     median {statistics.median(ft):.3f}s  {sorted(ft)}")
    print(f"unrolled median {statistics.median(ut):.3f}s  {sorted(ut)}")
    spark.stop()


if __name__ == "__main__":
    main()
