"""Streaming incremental dedup == one-shot batch dedup.

Documents arrive as 3 micro-batches (3 parquet files,
maxFilesPerTrigger=1); every batch is checked against the persisted
band index and absorbed. The cumulative emitted pair set must equal
minhash_lsh_dedup over the whole corpus — every near-dup pair is
found exactly when its second member arrives, none twice."""

from __future__ import annotations

import pytest
import os
import tempfile

from pyspark.sql import functions as F

from nerd_spark.operators.dedup import minhash_lsh_dedup
from nerd_spark.session import read_table
from nerd_spark.streaming.dedup_stream import stream_dedup


@pytest.mark.slow
def test_streamed_pairs_equal_batch_dedup(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")

    base = tempfile.mkdtemp(prefix="nerd_dedup_stream_")
    src = os.path.join(base, "incoming")
    # 3 arrival files, disjoint by doc_id stripe
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        stream_dedup(
            spark,
            stream,
            index_dir=os.path.join(base, "index"),
            pairs_dir=os.path.join(base, "pairs"),
            checkpoint_dir=os.path.join(base, "ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r.a_id, r.b_id, r.jaccard)
        for r in spark.read.parquet(os.path.join(base, "pairs")).collect()
    }
    want = {
        (r.a_id, r.b_id, r.jaccard)
        for r in minhash_lsh_dedup(spark, docs, threshold=0.5).collect()
    }
    assert got == want and len(want) > 0


@pytest.mark.slow
def test_replayed_epoch_is_idempotent(spark, sf_dir):
    # foreachBatch is at-least-once: re-running an epoch (crash after a
    # partial/total index absorption) must not double-absorb the batch
    # or re-emit its pairs as extra rows.
    from nerd_spark.streaming.dedup_stream import process_batch

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)

    base = tempfile.mkdtemp(prefix="nerd_dedup_replay_")
    idx = os.path.join(base, "index")
    pdir = os.path.join(base, "pairs")

    process_batch(spark, b0, idx, epoch_id=0, pairs_dir=pdir)
    p1 = process_batch(spark, b1, idx, epoch_id=1, pairs_dir=pdir)
    n1 = p1.count()
    bands_rows = spark.read.parquet(os.path.join(idx, "bands")).count()

    # replay epoch 1 (index already contains it — the crashed-after-
    # absorb case); results and state must be byte-identical
    p1r = process_batch(spark, b1, idx, epoch_id=1, pairs_dir=pdir)
    assert p1r.count() == n1
    assert spark.read.parquet(os.path.join(idx, "bands")).count() == bands_rows
    all_pairs = {
        (r.a_id, r.b_id) for r in spark.read.parquet(pdir).collect()
    }
    want = {
        (r.a_id, r.b_id)
        for r in minhash_lsh_dedup(spark, docs, threshold=0.5).collect()
    }
    assert all_pairs == want
