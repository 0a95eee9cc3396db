"""Derived-state management through the Hadoop FS layer.

All driver-side state listings (streaming epoch dirs, summary commit
markers, retention pruning) go through nerd_spark.sources.fsutil, so
they must work when the state path carries an explicit filesystem
scheme — `file://...` here stands in for hdfs:// / s3a:// (any
os.listdir/os.path probe on such a URI string fails or silently
reports absent, which is exactly the regression these tests pin)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nerd_spark.session import read_table
from nerd_spark.sources import fsutil


def _uri(p) -> str:
    return "file://" + str(p)


def test_fsutil_basics(spark, tmp_path):
    root = _uri(tmp_path / "state")
    assert fsutil.list_names(spark, root) == []
    assert not fsutil.exists(spark, root + "/_SUCCESS")
    fsutil.touch(spark, root + "/_SUCCESS")
    assert fsutil.exists(spark, root + "/_SUCCESS")
    assert fsutil.is_dir(spark, root) and not fsutil.is_dir(
        spark, root + "/_SUCCESS"
    )
    fsutil.touch(spark, root + "/epoch=0")
    assert sorted(fsutil.list_names(spark, root)) == ["_SUCCESS", "epoch=0"]
    assert fsutil.mtime(spark, root + "/_SUCCESS") > 0
    assert fsutil.delete(spark, root + "/_SUCCESS")
    assert not fsutil.exists(spark, root + "/_SUCCESS")
    # os.listdir on the same URI string is exactly what broke before
    import pytest

    with pytest.raises(OSError):
        os.listdir(root)


def test_nru_ticks_on_uri_paths(spark, sf_dir, tmp_path):
    """Two NRU ticks with file://-scheme state paths equal the same
    ticks on plain local paths — the epoch listing resolves through
    the scheme instead of silently starting from empty state."""
    from nerd_spark.streaming.nru_stream import apply_nru_tick, read_schedule

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    mid = ev.agg(
        F.to_timestamp(F.from_unixtime(F.avg(F.unix_timestamp("ts"))))
    ).first()[0]
    halves = [ev.filter(F.col("ts") <= mid), ev.filter(F.col("ts") > mid)]

    plain_sched, plain_due = str(tmp_path / "ps"), str(tmp_path / "pd")
    uri_sched, uri_due = _uri(tmp_path / "us"), _uri(tmp_path / "ud")
    for epoch, h in enumerate(halves):
        apply_nru_tick(spark, plain_sched, plain_due, h, epoch)
        apply_nru_tick(spark, uri_sched, uri_due, h, epoch)

    cols = ["entity", "added", "last_act", "nru"]
    want = sorted(tuple(r) for r in read_schedule(spark, plain_sched).select(*cols).collect())
    got = sorted(tuple(r) for r in read_schedule(spark, uri_sched).select(*cols).collect())
    assert got == want and len(want) > 0
    # the second tick genuinely saw the first's state (not empty):
    # entities only active in half1 still carry their advanced slot
    only_h1 = {r.entity for r in halves[0].groupBy(F.col("user_id").alias("entity")).count().collect()} - {
        r.entity for r in halves[1].groupBy(F.col("user_id").alias("entity")).count().collect()
    }
    if only_h1:
        sched_entities = {r.entity for r in read_schedule(spark, uri_sched).collect()}
        assert only_h1 <= sched_entities


def test_summary_maintenance_on_uri_path(spark, sf_dir, tmp_path):
    """Incremental summary merge + retention pruning through a
    file:// summary path: partition presence, _SUCCESS handling and
    partition deletes all resolve through the Hadoop FS."""
    import datetime as dt

    from nerd_spark.plans import derivations as D
    from nerd_spark.sources.layout import prune_summary, update_daily_summary

    ev = read_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    path = _uri(tmp_path / "summary")

    update_daily_summary(spark, path, ev.filter(F.col("ts") <= mid))
    update_daily_summary(spark, path, ev.filter(F.col("ts") > mid))

    got = {
        (r.entity, str(r.d), r.cat, r.n, float(r.val_dec))
        for r in spark.read.parquet(path).collect()
    }
    want = {
        (r.entity, str(r.d), r.cat, r.n, float(r.val_dec))
        for r in D.daily_rollup(ev, "user_id").collect()
    }
    assert got == want and len(want) > 0
    assert fsutil.exists(spark, path + "/_SUCCESS")

    days = sorted(d for d in fsutil.list_names(spark, path) if d.startswith("d="))
    anchor = dt.date.fromisoformat(days[-1][2:])
    dropped = prune_summary(spark, path, keep_days=2, as_of=anchor)
    left = sorted(d for d in fsutil.list_names(spark, path) if d.startswith("d="))
    assert set(dropped) == set(days) - set(left) and len(dropped) > 0
    assert spark.read.parquet(path).count() > 0


def test_dedup_stream_index_on_uri_path(spark, tmp_path):
    """Streaming dedup's epoch-keyed index works behind a scheme URI:
    batch 2 finds its near-dup against batch 1's absorbed index."""
    from nerd_spark.streaming.dedup_stream import process_batch

    idx = _uri(tmp_path / "idx")
    d1 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    d2 = spark.createDataFrame(
        [(2, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    p1 = process_batch(spark, d1, idx)
    assert p1.count() == 0
    p2 = process_batch(spark, d2, idx)
    got = {(r.a_id, r.b_id) for r in p2.collect()}
    assert got == {(1, 2)}


def test_a_family_serves_through_uri_data_dir(spark, sf_dir, tmp_path):
    """The freshness probes go through the Hadoop FS layer, so a
    scheme-qualified data dir (file:// standing in for hdfs://, s3a://)
    SERVES from its precomputed window table instead of silently
    always falling back to the raw scan."""
    from nerd_spark.queries import REGISTRY
    from nerd_spark.sources.layout import optimize_layout

    out = str(tmp_path / "opt")
    optimize_layout(spark, sf_dir, out, tables=["events"])
    uri = "file://" + out
    for q in ("a2_window_totals", "a3_ewma"):
        plan = REGISTRY[q](spark, uri)._jdf.queryExecution().optimizedPlan().toString()
        assert "Aggregate" not in plan, f"{q} fell back on a URI data dir"
        assert REGISTRY[q](spark, uri).count() > 0
