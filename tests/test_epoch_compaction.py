"""Base-epoch roll-up (streaming/epochs.py): serving equality across
compaction, keep_recent, replay safety, and crash-window resume —
over BOTH additive state tables (hh terms, quantile histograms)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from nerd_spark.session import read_table
from nerd_spark.streaming import hh_stream, quantile_stream
from nerd_spark.streaming.epochs import compact_epochs
from nerd_spark.streaming.hh_stream import _epochs


def _hh_serve(spark, state):
    return {
        (r.term, r.cnt, r.share)
        for r in hh_stream.current_heavy_hitters(spark, state, 0.01).collect()
    }


def _q_serve(spark, state):
    return {
        (r.event_type, r.p, r.value)
        for r in quantile_stream.current_quantiles(
            spark, state, [0.5, 0.95]
        ).collect()
    }


def test_compaction_preserves_serves_and_bounds_width(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    base = tempfile.mkdtemp(prefix="nerd_epoch_compact_")
    hh_state = os.path.join(base, "hh")
    q_state = os.path.join(base, "q")
    for i in range(4):
        hh_stream.process_batch(
            spark, docs.filter(F.col("doc_id") % 4 == i), hh_state, epoch_id=i
        )
        quantile_stream.process_batch(
            spark, ev.filter(F.col("event_id") % 4 == i), q_state, epoch_id=i
        )
    hh_before, q_before = _hh_serve(spark, hh_state), _q_serve(spark, q_state)
    assert len(hh_before) > 0 and len(q_before) > 0

    # keep_recent leaves the newest epoch unfolded
    assert compact_epochs(spark, hh_state, "tf", keep_recent=1) == 3
    assert _epochs(spark, hh_state) == [2, 3]
    assert _hh_serve(spark, hh_state) == hh_before

    # full fold on the quantile state
    assert compact_epochs(spark, q_state, "cnt") == 4
    assert _epochs(spark, q_state) == [3]
    assert _q_serve(spark, q_state) == q_before

    # idempotent: nothing left to fold
    assert compact_epochs(spark, q_state, "cnt") == 0

    # NEW batches land at fresh ids above the base and keep adding up
    hh_stream.process_batch(spark, docs.filter(F.col("doc_id") % 4 == 0), hh_state)
    assert _epochs(spark, hh_state) == [2, 3, 4]
    from nerd_spark.operators.sketches import heavy_hitter_terms

    doubled = docs.unionByName(docs.filter(F.col("doc_id") % 4 == 0))
    want = {
        (r.term, r.cnt, r.share)
        for r in heavy_hitter_terms(doubled, 0.01).collect()
    }
    assert _hh_serve(spark, hh_state) == want


def test_crash_window_resume(spark, sf_dir):
    """Simulate the crash between source-delete and rename: a complete
    .new dir with the sources gone must be landed by the next call
    before anything else — no data loss, serve restored."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="nerd_epoch_crash_")
    state = os.path.join(base, "hh")
    for i in range(3):
        hh_stream.process_batch(
            spark, docs.filter(F.col("doc_id") % 3 == i), state, epoch_id=i
        )
    before = _hh_serve(spark, state)

    # build what a compaction writes, then "crash" after the deletes
    paths = [os.path.join(state, f"epoch={e}") for e in range(3)]
    pairs = spark.read.option("basePath", state).parquet(*paths).drop("epoch")
    merged = pairs.groupBy("term").agg(F.sum("tf").alias("tf"))
    merged.write.mode("overwrite").parquet(os.path.join(state, "epoch=2.new"))
    for e in range(3):
        shutil.rmtree(os.path.join(state, f"epoch={e}"))
    # serve in the crash window: transient undercount, never a crash
    assert _hh_serve(spark, state) == set()

    assert compact_epochs(spark, state, "tf") == 0  # resume only
    assert _epochs(spark, state) == [2]
    assert _hh_serve(spark, state) == before

    # a TORN .new (no _SUCCESS) is never landed
    state2 = os.path.join(base, "hh2")
    for i in range(2):
        hh_stream.process_batch(
            spark, docs.filter(F.col("doc_id") % 2 == i), state2, epoch_id=i
        )
    b2 = _hh_serve(spark, state2)
    torn = os.path.join(state2, "epoch=5.new")
    os.makedirs(torn)
    open(os.path.join(torn, "part-junk.parquet"), "wb").close()
    assert compact_epochs(spark, state2, "tf") == 2
    assert _epochs(spark, state2) == [1]
    assert _hh_serve(spark, state2) == b2
