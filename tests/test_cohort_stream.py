"""Streaming cohort retention == one-shot batch cohort_retention.

Events arrive as 3 micro-batches; each epoch writes its additive
(u, d, kind, cnt) day-set reduction. The cumulative serving query
must equal the batch operator over the whole set, replaying an epoch
(foreachBatch at-least-once) must change nothing, a torn epoch (no
_SUCCESS) must be invisible until committed, and a base-epoch
compaction must not move the served answer."""

from __future__ import annotations
import pytest

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from nerd_spark.operators.funnels import cohort_retention
from nerd_spark.session import read_table
from nerd_spark.streaming.cohort_stream import (
    current_retention,
    process_batch,
    stream_retention,
)


def _serve(spark, state):
    return {
        (r.cohort_date, r.period, r.cohort_size, r.active_users, r.retention)
        for r in current_retention(spark, state).collect()
    }


@pytest.mark.slow
def test_streamed_cohort_equals_batch_replay_torn_and_compaction(
    spark, sf_dir
):
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )

    base = tempfile.mkdtemp(prefix="nerd_cohort_stream_")
    src = os.path.join(base, "incoming")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    state = os.path.join(base, "state")
    q = stream_retention(
        spark, stream, state_dir=state,
        checkpoint_dir=os.path.join(base, "ckpt"),
    )
    q.awaitTermination(300)

    got = _serve(spark, state)
    want = {
        (r.cohort_date, r.period, r.cohort_size, r.active_users, r.retention)
        for r in cohort_retention(ev, "signup").collect()
    }
    assert got == want and len(want) > 0

    # at-least-once replay: re-absorbing epoch 0 rewrites identical
    # state (deterministic reduction, own-epoch overwrite) — and even
    # a DOUBLE-counted epoch (copied to a fresh id) cannot move the
    # answer, because serving reads only row EXISTENCE
    process_batch(
        spark, ev.filter(F.col("event_id") % 3 == 0), state,
        anchor_type="signup", epoch_id=0,
    )
    assert _serve(spark, state) == got
    process_batch(
        spark, ev.filter(F.col("event_id") % 3 == 0), state,
        anchor_type="signup", epoch_id=7,
    )
    assert _serve(spark, state) == got

    # torn epoch: data files without _SUCCESS are not served
    e0, e9 = os.path.join(state, "epoch=0"), os.path.join(state, "epoch=9")
    shutil.copytree(e0, e9)
    os.remove(os.path.join(e9, "_SUCCESS"))
    assert _serve(spark, state) == got

    # base-epoch compaction folds the additive cnt state; serve equal
    from nerd_spark.streaming.epochs import compact_epochs

    folded = compact_epochs(spark, state, "cnt", keep_recent=1)
    assert folded > 0
    assert _serve(spark, state) == got

    # empty state serves an empty, correctly-shaped frame
    empty = current_retention(spark, os.path.join(base, "nowhere"))
    assert empty.collect() == []
    assert [f.name for f in empty.schema.fields] == [
        "cohort_date", "period", "cohort_size", "active_users", "retention"
    ]
