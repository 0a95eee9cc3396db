"""Benchmark-contamination detection: verbatim n-gram overlap between
a training corpus and a held-out evaluation set.

The standard LLM-pipeline decontamination check (GPT-3 appendix C /
PaLM style): an eval example is contaminated if a training document
shares >= 1 verbatim n-word gram with it (n ~ 8-13); the overlap
fraction grades severity.

Scale shape: the EVAL side is tiny (benchmark suites are megabytes)
— its distinct n-gram set is broadcast, so the 100 TB corpus side is
a map-only shingle + broadcast hash join with NO corpus shuffle; the
only shuffle aggregates the hit rows, O(contaminated pairs). Reuses
the map-only shingle machinery from operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nerd_spark.operators.dedup import _spread, shingle_arrays, shingle_rows


def ngram_contamination(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(train_id, eval_id, shared_ngrams, eval_ngrams, eval_frac) for
    every train/eval pair sharing at least one verbatim n-gram.
    eval_frac = fraction of the eval doc's distinct n-grams that leak
    from that training doc. Joins on the exact shingle string (not a
    hash) so the count is collision-free and oracle-checkable."""
    # _spread: the CPU-heavy k=8 shingle concat must run at cluster
    # width — a narrow input (few parquet files, or a checkpointed
    # funnel stage that kept its upstream partitioning) would
    # serialize this map stage (measured 7.6 s -> ~1 s at sf0.1; it
    # was the dominant stage of the curation flagship)
    tr = shingle_rows(_spread(train), id_col, text_col, k=n).withColumnRenamed(
        "id", "train_id"
    )
    # eval side: per-doc distinct n-gram count comes from the array
    # size BEFORE the explode, so no groupBy is needed for it — the
    # whole eval branch is map-only and the plan's single shuffle is
    # the hit aggregation (plan-asserted in tests)
    ev = (
        shingle_arrays(eval_docs, id_col, text_col, k=n)
        .select(
            F.col("id").alias("eval_id"),
            F.array_distinct("sarr").alias("sarr"),
        )
        .withColumn("eval_ngrams", F.size("sarr"))
        .select("eval_id", "eval_ngrams", F.explode("sarr").alias("s"))
    )
    return (
        tr.join(F.broadcast(ev), "s")
        .groupBy("train_id", "eval_id", "eval_ngrams")
        .agg(F.count("*").alias("shared_ngrams"))
        .select(
            "train_id",
            "eval_id",
            "shared_ngrams",
            "eval_ngrams",
            F.round(F.col("shared_ngrams") / F.col("eval_ngrams"), 6).alias("eval_frac"),
        )
    )
