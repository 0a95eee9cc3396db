"""Streaming exact quantiles == one-shot batch exact_quantiles_by.

Events arrive as 3 micro-batches; each epoch writes its own exact
value-histogram compaction. The cumulative serving query must equal
the batch operator over the whole set, replaying an epoch
(foreachBatch at-least-once) must change nothing, and a torn epoch
(no _SUCCESS) must be invisible until committed."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from nerd_spark.operators.sketches import exact_quantiles_by
from nerd_spark.session import read_table
from nerd_spark.streaming.quantile_stream import (
    current_quantiles,
    process_batch,
    stream_quantiles,
)

PROBS = [0.25, 0.5, 0.95]


def _serve(spark, state):
    return {
        (r.event_type, r.p, r.value)
        for r in current_quantiles(spark, state, PROBS).collect()
    }


def test_streamed_quantiles_equal_batch_and_replay_idempotent(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select("event_id", "event_type", "value")

    base = tempfile.mkdtemp(prefix="nerd_q_stream_")
    src = os.path.join(base, "incoming")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    state = os.path.join(base, "state")
    q = stream_quantiles(
        spark, stream, state_dir=state,
        checkpoint_dir=os.path.join(base, "ckpt"),
    )
    q.awaitTermination(300)

    got = _serve(spark, state)
    want = {
        (r.event_type, r.p, r.value)
        for r in exact_quantiles_by(ev, "event_type", "value", PROBS).collect()
    }
    assert got == want and len(want) > 0

    # at-least-once replay: re-absorbing epoch 0 rewrites identical
    # state (deterministic histogram, own-epoch overwrite)
    process_batch(spark, ev.filter(F.col("event_id") % 3 == 0), state, epoch_id=0)
    assert _serve(spark, state) == got

    # torn epoch: data files without _SUCCESS are not served
    e0, e9 = os.path.join(state, "epoch=0"), os.path.join(state, "epoch=9")
    shutil.copytree(e0, e9)
    os.remove(os.path.join(e9, "_SUCCESS"))
    assert _serve(spark, state) == got

    # empty state serves an empty, correctly-shaped frame
    empty = current_quantiles(spark, os.path.join(base, "nowhere"), PROBS)
    assert empty.collect() == []
    assert [f.name for f in empty.schema.fields] == ["event_type", "p", "value"]
