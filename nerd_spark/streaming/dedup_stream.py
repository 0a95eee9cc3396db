"""Continuous-ingestion near-dup detection: Structured Streaming over
arriving documents, each micro-batch checked against (and added to) a
persisted MinHash LSH index.

State is two append-only parquet tables, not the streaming state
store (the entity-table pattern of streaming/ingest.py):
- ``<index>/bands``:    (id, b, h) band signatures — the LSH index
- ``<index>/shingles``: (id, ss)   distinct shingle arrays — the
                        verification payload

Per micro-batch: signatures for the batch ONLY (map work O(batch)),
candidates = batch bands ⋈ (index ∪ batch bands) — the batch side
broadcasts, the index never shuffles — then exact-Jaccard verify
against the persisted shingle sets of just the candidate ids.
Cumulative emitted pairs equal the one-shot batch dedup over
everything ingested so far (proven in tests/test_dedup_stream.py):
every pair is found exactly when its second member arrives.

At 100 TB the two state tables are date-partitioned and bucketed by
(b, h) / id respectively; a micro-batch touches O(batch + collisions)
rows of either. The shingle store is the large one — production
variants replace it with fixed-width signature sketches; the seam is
the same.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from nerd_spark.operators.dedup import (
    _pair_jaccard,
    minhash_band_table,
    shingle_arrays,
)


def process_batch(
    spark,
    batch_docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_bands: int = 4,
    rows_per_band: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Dedup one arriving batch against the index, then absorb it.
    Returns the new near-dup pairs (a_id < b_id, at least one side in
    the batch). Usable directly, or as the foreachBatch body via
    :func:`stream_dedup`."""
    bands_path = os.path.join(index_dir, "bands")
    sets_path = os.path.join(index_dir, "shingles")
    have_index = os.path.exists(os.path.join(bands_path, "_SUCCESS"))

    sarr = shingle_arrays(batch_docs, id_col, text_col, k).cache()
    batch_bands = minhash_band_table(sarr, n_bands, rows_per_band).cache()
    batch_sets = sarr.select("id", F.array_distinct("sarr").alias("ss"))

    if have_index:
        all_bands = spark.read.parquet(bands_path).unionByName(batch_bands)
        all_sets = spark.read.parquet(sets_path).unionByName(batch_sets)
    else:
        all_bands, all_sets = batch_bands, batch_sets

    cand = (
        all_bands.alias("x")
        .join(F.broadcast(batch_bands.alias("y")), ["b", "h"])
        .filter(F.col("x.id") != F.col("y.id"))
        .select(
            F.least("x.id", "y.id").alias("a_id"),
            F.greatest("x.id", "y.id").alias("b_id"),
        )
        .distinct()
    )
    pairs = _pair_jaccard(cand, all_sets).filter(F.col("jaccard") >= threshold)
    # Materialize pairs BEFORE appending the batch to the index (the
    # candidate join must not see the batch twice on the index side).
    out = pairs.cache()
    out.count()
    batch_bands.write.mode("append").parquet(bands_path)
    batch_sets.write.mode("append").parquet(sets_path)
    return out


def stream_dedup(
    spark,
    docs_stream: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    **kw,
):
    """Wire :func:`process_batch` as a foreachBatch sink: every
    micro-batch's new pairs append to ``pairs_dir``. availableNow /
    continuous triggers both work; per-key ordering is irrelevant
    (pair discovery is commutative across batches)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        pairs = process_batch(spark, batch_df, index_dir, **kw)
        pairs.write.mode("append").parquet(pairs_dir)

    return (
        docs_stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
