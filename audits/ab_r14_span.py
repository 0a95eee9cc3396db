#!/usr/bin/env python
"""Interleaved same-process A/B: span_dedup OLD shape (r13 HEAD,
inlined below) vs NEW decomposed shape (boiler-fp-only build side +
map-side per-doc distinct df counting), on a given data dir.

Usage: python audits/ab_r14_span.py <data_dir> [reps]

Prints per-rep walls (alternating order), then verifies the two
frames are row-identical (exceptAll both ways).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from nerd_spark.functions.text import tokens
from nerd_spark.operators.dedup import _spread
from nerd_spark.session import get_spark, read_table


def old_span_dedup(docs, id_col="doc_id", text_col="text", k=10, min_df=2):
    base = _spread(docs).select(
        F.col(id_col).alias("id"), tokens(text_col).alias("toks")
    )
    nblocks = F.ceil(F.size("toks") / F.lit(k)).cast("int")
    idxs = F.when(nblocks > 0, F.sequence(F.lit(0), nblocks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    blocks = base.select(
        "id",
        F.explode(
            F.transform(
                idxs,
                lambda i: F.struct(
                    i.alias("bi"),
                    F.concat_ws(" ", F.slice("toks", i * k + 1, k)).alias("btext"),
                ),
            )
        ).alias("b"),
    ).select("id", "b.bi", "b.btext", F.md5("b.btext").alias("fp"))
    df_counts = blocks.groupBy("fp").agg(
        F.count_distinct("id").alias("block_df")
    )
    flagged = blocks.join(df_counts, "fp").withColumn(
        "boiler", F.col("block_df") >= min_df
    )
    kept = F.array_sort(
        F.collect_list(F.when(~F.col("boiler"), F.struct("bi", "btext")))
    )
    return flagged.groupBy(F.col("id").alias("doc_id")).agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.sum(F.col("boiler").cast("long")).alias("n_removed"),
        F.concat_ws(" ", F.transform(kept, lambda s: s["btext"])).alias(
            "kept_text"
        ),
    )


def new_span_dedup(docs, id_col="doc_id", text_col="text", k=10, min_df=2):
    base = _spread(docs).select(
        F.col(id_col).alias("id"), tokens(text_col).alias("toks")
    )
    nblocks = F.ceil(F.size("toks") / F.lit(k)).cast("int")
    idxs = F.when(nblocks > 0, F.sequence(F.lit(0), nblocks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    blocks = base.select(
        "id",
        F.explode(
            F.transform(
                idxs,
                lambda i: F.struct(
                    i.alias("bi"),
                    F.concat_ws(" ", F.slice("toks", i * k + 1, k)).alias("btext"),
                ),
            )
        ).alias("b"),
    ).select("id", "b.bi", "b.btext", F.md5("b.btext").alias("fp"))
    # df side: per-doc DISTINCT fps map-side; plain count; only
    # boilerplate fps survive to the join build side
    docfp = base.select(
        F.explode(
            F.array_distinct(
                F.transform(
                    idxs,
                    lambda i: F.md5(
                        F.concat_ws(" ", F.slice("toks", i * k + 1, k))
                    ),
                )
            )
        ).alias("fp")
    )
    boiler_fps = (
        docfp.groupBy("fp")
        .agg(F.count("*").alias("block_df"))
        .filter(F.col("block_df") >= min_df)
        .select("fp", F.lit(True).alias("boiler0"))
    )
    flagged = blocks.join(boiler_fps, "fp", "left").withColumn(
        "boiler", F.coalesce("boiler0", F.lit(False))
    )
    kept = F.array_sort(
        F.collect_list(F.when(~F.col("boiler"), F.struct("bi", "btext")))
    )
    return flagged.groupBy(F.col("id").alias("doc_id")).agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.sum(F.col("boiler").cast("long")).alias("n_removed"),
        F.concat_ws(" ", F.transform(kept, lambda s: s["btext"])).alias(
            "kept_text"
        ),
    )


def main():
    data_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="ab_r14_span")
    spark.range(1000).selectExpr("sum(id)").collect()
    docs = read_table(spark, data_dir, "documents")
    docs.count()

    def run(fn, label):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        fn(docs).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        return round(dt, 3)

    for r in range(reps):
        pair = [("old", old_span_dedup), ("new", new_span_dedup)]
        if r % 2:
            pair.reverse()
        walls = {lbl: run(fn, f"span {lbl} rep{r}") for lbl, fn in pair}
        print(f"rep{r}: {walls}", flush=True)

    a = old_span_dedup(docs)
    b = new_span_dedup(docs)
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    print(f"diff old-new={d1} new-old={d2}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
