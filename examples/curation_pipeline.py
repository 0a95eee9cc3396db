#!/usr/bin/env python
"""End-to-end training-data curation over the synthetic documents
table — the order a production corpus pipeline runs:

  1. model-based quality gate (ml/quality.py)
  2. benchmark decontamination (operators/contamination.py)
  3. near-dup removal: MinHash LSH pairs -> connected-component
     clusters -> keep canonical survivor (operators/dedup.py,
     components.py)
  4. domain-weighted mixture resampling (operators/sampling.py)
  5. train/val split + greedy sequence packing + shard assignment

Every stage prints its yield so the funnel is auditable.

Run: PYTHONPATH=. python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from nerd_spark.ml.quality import gopher_rules, quality_filter
from nerd_spark.operators import dedup as DD
from nerd_spark.operators.components import dedup_clusters
from nerd_spark.operators.contamination import ngram_contamination
from nerd_spark.operators.sampling import (
    hash_split,
    mixture_sample,
    pack_sequences,
    shard_assign,
    temperature_mixture,
)
from nerd_spark.session import get_spark, read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="curation_pipeline", shuffle_partitions=8)
    docs = read_table(spark, sf_dir, "documents")
    n0 = docs.count()
    print(f"corpus: {n0} docs")

    # 1a. heuristic rule battery (Gopher-style; auditable flags)
    docs = docs.join(gopher_rules(docs).filter("keep").select("doc_id"), "doc_id")
    n1a = docs.count()
    print(f"after gopher rules: {n1a} ({n1a / n0:.0%})")

    # 1b. model-based quality gate
    docs = quality_filter(docs, threshold=0.32).filter("kept").drop("q_score", "kept")
    n1 = docs.count()
    print(f"after quality gate: {n1} ({n1 / n0:.0%})")

    # 1c. cross-document boilerplate (span) removal — downstream
    # stages consume the cleaned text
    cleaned = DD.span_dedup(docs, k=10, min_df=2).select(
        "doc_id", F.col("kept_text").alias("text")
    )
    docs = docs.drop("text").join(cleaned, "doc_id").filter(
        F.length(F.trim("text")) > 0
    )
    removed = docs.count()
    print(f"after span removal: {removed} docs (cleaned text)")

    # 2. decontamination vs a held-out eval slice
    ev = docs.filter(F.col("doc_id") % 19 == 3)
    tr = docs.filter(F.col("doc_id") % 19 != 3)
    contaminated = (
        ngram_contamination(tr, ev, n=8)
        .filter(F.col("eval_frac") >= 0.5)
        .select(F.col("train_id").alias("doc_id"))
        .distinct()
    )
    docs = tr.join(contaminated, "doc_id", "left_anti")
    n2 = docs.count()
    print(f"after decontamination: {n2}")

    # 3. near-dup removal (keep each cluster's canonical root)
    pairs = DD.minhash_lsh_dedup(spark, docs, threshold=0.5)
    clusters = dedup_clusters(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_root")).select("doc_id")
    docs = docs.join(losers, "doc_id", "left_anti")
    n3 = docs.count()
    print(f"after near-dup removal: {n3}")

    # 4. mixture: explicit domain weights OR temperature balancing
    mix = mixture_sample(docs, rates={"src0": 2.0, "src1": 0.5}, salt="mix")
    sampled = mix.join(docs.drop("source"), "doc_id")
    n4 = sampled.count()
    print(f"after mixture resampling: {n4} (with epoch copies)")
    tmix = temperature_mixture(docs)
    print(f"temperature-balanced alternative: {tmix.count()} rows, "
          f"{tmix.select('source').distinct().count()} sources")

    # 5. split, pack, shard
    split = hash_split(sampled.select("doc_id", "text", "source").distinct())
    train = split.filter("split = 'train'")
    packed = pack_sequences(train, budget=512, group_col="source")
    shards = shard_assign(train, n_shards=4)
    print(
        f"train/val: {train.count()}/{split.count() - train.count()}; "
        f"bins: {packed.agg(F.count_distinct('source', 'bin_idx')).first()[0]}; "
        f"shards: {shards.groupBy('shard').count().count()}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
