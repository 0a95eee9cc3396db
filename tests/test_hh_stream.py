"""Streaming heavy hitters == one-shot batch hh_terms.

Documents arrive as 3 micro-batches; each epoch writes its own exact
(term, tf) compaction. The cumulative serving query must equal
heavy_hitter_terms over the whole corpus, and replaying an epoch
(foreachBatch at-least-once) must change nothing."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from nerd_spark.operators.sketches import heavy_hitter_terms
from nerd_spark.session import read_table
from nerd_spark.streaming.hh_stream import (
    current_heavy_hitters,
    process_batch,
    stream_heavy_hitters,
)


def test_streamed_hh_equals_batch_and_replay_idempotent(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")

    base = tempfile.mkdtemp(prefix="nerd_hh_stream_")
    src = os.path.join(base, "incoming")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    state = os.path.join(base, "state")
    q = stream_heavy_hitters(
        spark, stream, state_dir=state, checkpoint_dir=os.path.join(base, "ckpt")
    )
    q.awaitTermination(300)

    got = {
        (r.term, r.cnt, r.share)
        for r in current_heavy_hitters(spark, state, 0.01).collect()
    }
    want = {
        (r.term, r.cnt, r.share)
        for r in heavy_hitter_terms(docs, 0.01).collect()
    }
    assert got == want and len(want) > 0

    # at-least-once replay: re-absorbing epoch 0 rewrites identical
    # state (deterministic kernel, own-epoch overwrite), nothing moves
    process_batch(spark, docs.filter(F.col("doc_id") % 3 == 0), state, epoch_id=0)
    again = {
        (r.term, r.cnt, r.share)
        for r in current_heavy_hitters(spark, state, 0.01).collect()
    }
    assert again == got

    # empty state serves an empty, correctly-shaped frame
    empty = current_heavy_hitters(spark, os.path.join(base, "nowhere"), 0.01)
    assert empty.collect() == []
