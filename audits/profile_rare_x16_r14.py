#!/usr/bin/env python
"""Stage-level timing of the rare-shingle candidate/verify path
(jaccard_dedup / containment_dedup) at a given data dir — r14
measure-first for the 16x cliff (158 s containment vs 5.7 s at 1x).

Run: PYTHONPATH=/root/repo python audits/profile_rare_x16_r14.py <dir>
"""
import sys
import time

from pyspark.sql import functions as F

from nerd_spark.operators import dedup as DD
from nerd_spark.session import get_spark, read_table


def main():
    data_dir = sys.argv[1]
    spark = get_spark(app_name="profile_rare_x16", shuffle_partitions=64)
    docs = read_table(spark, data_dir, "documents")
    docs.count()
    spark.range(1000).selectExpr("sum(id)").collect()

    t0 = time.monotonic()
    sarr = DD.shingle_arrays(DD._spread(docs), "doc_id", "text", 3).cache()
    n_docs = sarr.count()
    t_shingle = time.monotonic() - t0

    sd = sarr.select("id", F.array_distinct("sarr").alias("ss"))
    sh = sd.select("id", F.explode("ss").alias("s"))
    t0 = time.monotonic()
    dfc = sh.groupBy("s").agg(F.count("*").alias("df"))
    rare = sh.join(dfc.filter(F.col("df") <= 20).select("s"), "s").cache()
    n_rare = rare.count()
    t_rare = time.monotonic() - t0

    t0 = time.monotonic()
    cand = (
        rare.alias("x")
        .join(rare.alias("y"), "s")
        .filter(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("a_id"), F.col("y.id").alias("b_id"))
        .agg(F.count("*").cast("long").alias("rc"))
    ).persist()
    n_cand = cand.count()
    t_cand = time.monotonic() - t0

    t0 = time.monotonic()
    rare_per_doc = rare.groupBy("id").agg(F.collect_list("s").alias("rl"))
    aset = (
        sd.join(rare_per_doc, "id", "left")
        .select(
            "id",
            F.size("ss").cast("long").alias("n"),
            F.array_except(
                "ss", F.coalesce("rl", F.array().cast("array<string>"))
            ).alias("hot"),
        )
        .cache()
    )
    n_aset = aset.count()
    t_aset = time.monotonic() - t0
    hot_stats = aset.agg(
        F.avg(F.size("hot")).alias("avg_hot"), F.max(F.size("hot")).alias("max_hot")
    ).first()

    t0 = time.monotonic()
    scored, pins = DD._pair_scores_rare(cand, aset)
    n_out = scored.filter(F.col("containment") >= 0.9).count()
    t_verify = time.monotonic() - t0

    print(
        f"docs={n_docs} rare_rows={n_rare} cand_pairs={n_cand} "
        f"aset={n_aset} avg_hot={hot_stats['avg_hot']:.2f} "
        f"max_hot={hot_stats['max_hot']} out={n_out}\n"
        f"shingle={t_shingle:.2f}s rare={t_rare:.2f}s cand={t_cand:.2f}s "
        f"aset={t_aset:.2f}s verify={t_verify:.2f}s "
        f"over_bound={n_cand > 2_000_000}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
