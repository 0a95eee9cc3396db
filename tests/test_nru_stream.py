"""Streaming NRU maintenance loop (streaming/nru_stream.py): two
streamed micro-batch ticks must equal two direct batch tick
applications, and the first tick's due set must equal the oracled
`nru_due_selection` batch query over the same events."""

from __future__ import annotations

import pytest
import os
import time

from pyspark.sql import functions as F

from nerd_spark.session import read_table
from nerd_spark.streaming.nru_stream import (
    apply_nru_tick,
    read_schedule,
    stream_nru,
)


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.slow
def test_nru_two_ticks_stream_equals_batch(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    mid = ev.agg(
        F.to_timestamp(F.from_unixtime(F.avg(F.unix_timestamp("ts"))))
    ).first()[0]
    half1 = ev.filter(F.col("ts") <= mid)
    half2 = ev.filter(F.col("ts") > mid)
    assert half1.count() > 0 and half2.count() > 0

    # spool: one file per micro-batch, mtime-ordered so the file
    # source ticks them in event-time order
    spool = str(tmp_path / "spool")
    half1.coalesce(1).write.parquet(spool + "/b1")
    half2.coalesce(1).write.parquet(spool + "/b2")
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    now = time.time()
    for i, sub in enumerate(["b1", "b2"]):
        src = [f for f in os.listdir(f"{spool}/{sub}") if f.endswith(".parquet")][0]
        dst = os.path.join(flat, f"{i}_{sub}.parquet")
        os.rename(os.path.join(spool, sub, src), dst)
        os.utime(dst, (now - 100 + i * 50, now - 100 + i * 50))

    s_sched, s_due = str(tmp_path / "s_sched"), str(tmp_path / "s_due")
    stream = (
        spark.readStream.schema(half1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    q = (
        stream_nru(spark, stream, s_sched, s_due, str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # batch double-apply: the same two chunks through the tick
    # function directly
    b_sched, b_due = str(tmp_path / "b_sched"), str(tmp_path / "b_due")
    apply_nru_tick(spark, b_sched, b_due, half1, 0)
    apply_nru_tick(spark, b_sched, b_due, half2, 1)

    cols = ["entity", "added", "last_act", "nru"]
    assert _rows(read_schedule(spark, s_sched), cols) == _rows(
        read_schedule(spark, b_sched), cols
    )
    for e in (0, 1):
        sd = spark.read.parquet(f"{s_due}/epoch={e}")
        bd = spark.read.parquet(f"{b_due}/epoch={e}")
        assert _rows(sd, ["entity", "nru", "overdue_days"]) == _rows(
            bd, ["entity", "nru", "overdue_days"]
        )

    # tick 1 from empty state == the oracled batch due scan over the
    # same events (restamp formula is nru_due_selection's)
    from nerd_spark.queries import REGISTRY

    half_dir = str(tmp_path / "half_sf")
    os.makedirs(half_dir)
    half1.write.parquet(os.path.join(half_dir, "events.parquet"))
    expected = REGISTRY["nru_due_selection"](spark, half_dir).select(
        F.col("user_id").alias("entity"),
        F.col("nru_1d").alias("nru"),
        "overdue_days",
    )
    got = spark.read.parquet(f"{s_due}/epoch=0")
    assert _rows(got, ["entity", "nru", "overdue_days"]) == _rows(
        expected, ["entity", "nru", "overdue_days"]
    )

    # replay safety: re-running tick 1 against the already-committed
    # state dirs (at-least-once foreachBatch) reproduces identical
    # epoch-1 outputs — no double-advance, no duplicate due rows
    before = _rows(read_schedule(spark, b_sched), cols)
    apply_nru_tick(spark, b_sched, b_due, half2, 1)
    assert _rows(read_schedule(spark, b_sched), cols) == before
