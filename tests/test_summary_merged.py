"""§2.4 merged snapshot: fold algebra, incremental maintenance, serve.

Pins the three contracts behind op_merge_snapshot's serve path
(r9 verdict #7):
- snapshot(A ∪ B) == merge(snapshot(A), snapshot(B)) — the op-algebra
  state really is associative/commutative, so per-batch ingest folds
  reproduce the one-shot aggregation exactly;
- update_merged_summary rewrites ONLY touched entity buckets and
  commits through the drop-_SUCCESS / touch-_SUCCESS gate;
- the query serves from the table when fresh (plan reads the summary,
  values identical to the raw fold) and falls back to the raw events
  scan when the table is stale.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nerd_spark.operators.merge import merge_snapshots, snapshot_events
from nerd_spark.queries.analytics import op_merge_snapshot
from nerd_spark.sources import fsutil
from nerd_spark.sources.layout import (
    SUMMARY_MERGED_DIRNAME,
    update_merged_summary,
)


def _mk_events(spark, n=600, users=25, start="2024-03-01 00:00:00"):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (
            F.to_timestamp(F.lit(start))
            + F.make_interval(mins=(F.col("id") * 7 % 10_000).cast("int"))
        ).alias("ts"),
        (F.col("id") % users).alias("user_id"),
        F.element_at(
            F.array(F.lit("login"), F.lit("scan"), F.lit("alert")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("event_type"),
        (F.col("id") % 97 / 7.0).alias("value"),
    )


def _rows(df):
    return sorted(
        (
            r.user_id,
            r.total,
            r.first_seen,
            tuple(r.types_arr),
            (r.last_arrival.ts, r.last_arrival.event_id),
            r.last_value,
        )
        for r in df.collect()
    )


def test_snapshot_merge_associativity(spark):
    ev = _mk_events(spark)
    a, b = ev.filter(F.col("event_id") < 300), ev.filter(
        F.col("event_id") >= 300
    )
    one_shot = snapshot_events(ev)
    folded = merge_snapshots(snapshot_events(a), snapshot_events(b))
    assert _rows(folded) == _rows(one_shot)
    # order independence (commutativity)
    folded_rev = merge_snapshots(snapshot_events(b), snapshot_events(a))
    assert _rows(folded_rev) == _rows(one_shot)


@pytest.fixture()
def data_dir(spark, tmp_path):
    d = str(tmp_path / "data")
    ev = _mk_events(spark)
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


def test_incremental_maintenance_and_serve(spark, data_dir):
    ev = spark.read.parquet(os.path.join(data_dir, "events.parquet"))
    spath = os.path.join(data_dir, SUMMARY_MERGED_DIRNAME)
    update_merged_summary(spark, spath, ev.filter(F.col("event_id") < 240))
    update_merged_summary(spark, spath, ev.filter(F.col("event_id") >= 240))
    # table state == one-shot fold
    assert _rows(spark.read.parquet(spath).drop("wb")) == _rows(
        snapshot_events(ev)
    )
    # the query SERVES it: plan reads the summary, not raw events...
    served = op_merge_snapshot(spark, data_dir)
    assert any(SUMMARY_MERGED_DIRNAME in f for f in served.inputFiles())
    # ...and values match the raw fold exactly (incl. rounding/join)
    raw = snapshot_events(ev).select(
        "user_id",
        "total",
        F.col("last_arrival.ts").alias("last_activity"),
        "first_seen",
        F.array_join("types_arr", "|").alias("types"),
        F.round("last_value", 2).alias("last_value"),
    )
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, raw.collect())
    )


def test_bucket_bounded_rewrite(spark, data_dir):
    ev = spark.read.parquet(os.path.join(data_dir, "events.parquet"))
    spath = os.path.join(data_dir, SUMMARY_MERGED_DIRNAME)
    update_merged_summary(spark, spath, ev)
    before = {
        wb: fsutil.mtime(spark, os.path.join(spath, wb))
        for wb in fsutil.list_names(spark, spath)
        if wb.startswith("wb=")
    }
    assert len(before) > 1  # the boundedness claim needs >1 bucket
    one = ev.filter(F.col("user_id") == 3).limit(1)
    update_merged_summary(spark, spath, one)
    touched, untouched = 0, 0
    for wb, mt in before.items():
        now = fsutil.mtime(spark, os.path.join(spath, wb))
        if now != mt:
            touched += 1
        else:
            untouched += 1
    assert touched == 1 and untouched == len(before) - 1
    # state still equals the one-shot fold over events ∪ the re-fold
    expect = merge_snapshots(snapshot_events(ev), snapshot_events(one))
    assert _rows(spark.read.parquet(spath).drop("wb")) == _rows(expect)


def test_stale_summary_falls_back_to_raw(spark, data_dir):
    ev = spark.read.parquet(os.path.join(data_dir, "events.parquet"))
    spath = os.path.join(data_dir, SUMMARY_MERGED_DIRNAME)
    update_merged_summary(spark, spath, ev)
    assert any(
        SUMMARY_MERGED_DIRNAME in f
        for f in op_merge_snapshot(spark, data_dir).inputFiles()
    )
    # events change AFTER the summary commit -> mtime gate trips
    import time

    time.sleep(1.1)  # mtime resolution
    ev.limit(5).write.mode("append").parquet(
        os.path.join(data_dir, "events.parquet")
    )
    out = op_merge_snapshot(spark, data_dir)
    assert all(SUMMARY_MERGED_DIRNAME not in f for f in out.inputFiles())
    out.collect()  # raw path executes
