"""Incrementally-maintained summary == full rebuild, with only the
batch's date partitions rewritten."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from nerd_spark.plans import derivations as D
from nerd_spark.session import read_table
from nerd_spark.sources.layout import update_daily_summary


def _rows(df):
    return {
        (r.entity, str(r.d), r.cat, r.n, float(r.val_dec)) for r in df.collect()
    }


def test_incremental_updates_equal_full_rebuild(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut1 = lo + (hi - lo) / 3
    cut2 = lo + 2 * (hi - lo) / 3
    path = os.path.join(tempfile.mkdtemp(prefix="nerd_summary_inc_"), "summary")

    update_daily_summary(spark, path, ev.filter(F.col("ts") <= cut1))
    update_daily_summary(
        spark, path, ev.filter((F.col("ts") > cut1) & (F.col("ts") <= cut2))
    )
    update_daily_summary(spark, path, ev.filter(F.col("ts") > cut2))

    got = _rows(spark.read.parquet(path))
    want = _rows(D.daily_rollup(ev, "user_id"))
    assert got == want and len(want) > 0


def test_streamed_summary_equals_full_rebuild(spark, sf_dir):
    from nerd_spark.streaming.summary_stream import stream_summary

    ev = read_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="nerd_summary_stream_")
    src = os.path.join(base, "incoming")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        stream_summary(
            spark,
            stream,
            summary_path=os.path.join(base, "summary"),
            checkpoint_dir=os.path.join(base, "ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = _rows(spark.read.parquet(os.path.join(base, "summary")))
    want = _rows(D.daily_rollup(ev, "user_id"))
    assert got == want and len(want) > 0


def test_prune_summary_drops_expired_partitions(spark, sf_dir):
    import datetime as dt

    from nerd_spark.sources.layout import prune_summary

    ev = read_table(spark, sf_dir, "events")
    path = os.path.join(tempfile.mkdtemp(prefix="nerd_summary_prune_"), "summary")
    update_daily_summary(spark, path, ev)
    days = sorted(d for d in os.listdir(path) if d.startswith("d="))
    assert len(days) >= 3
    anchor = dt.date.fromisoformat(days[-1][2:])
    keep = 2
    dropped = prune_summary(spark, path, keep_days=keep, as_of=anchor)
    left = sorted(d for d in os.listdir(path) if d.startswith("d="))
    assert set(dropped) == set(days) - set(left)
    for d in left:
        assert (anchor - dt.date.fromisoformat(d[2:])).days <= keep
    # surviving data still reads cleanly
    assert spark.read.parquet(path).count() > 0


def test_untouched_partitions_not_rewritten(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    path = os.path.join(tempfile.mkdtemp(prefix="nerd_summary_inc2_"), "summary")

    update_daily_summary(spark, path, ev.filter(F.col("ts") <= mid))
    first_days = {d for d in os.listdir(path) if d.startswith("d=")}
    mtimes = {d: os.path.getmtime(os.path.join(path, d)) for d in first_days}

    # second batch: strictly later days (minus the boundary day)
    later = ev.filter(F.to_date("ts") > F.lit(mid.date()))
    update_daily_summary(spark, path, later)

    touched = {
        "d=" + str(r.d)
        for r in later.select(F.to_date("ts").alias("d")).distinct().collect()
    }
    for d in first_days - touched:
        assert os.path.getmtime(os.path.join(path, d)) == mtimes[d], (
            f"untouched partition {d} was rewritten"
        )
