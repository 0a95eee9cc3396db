"""Tests: salted rollup equivalence; stateful streaming profile vs
batch ground truth."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from nerd_spark.operators.skew import salted_rollup
from nerd_spark.session import read_table
from nerd_spark.streaming.stateful import running_profiles


def test_salted_rollup_equals_plain(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    plain = {
        (r.user_id, r.event_type): (r.n, round(r.s, 4))
        for r in ev.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    salted = {
        (r.user_id, r.event_type): (r.n, round(r.sum_value, 4))
        for r in salted_rollup(
            ev.select("user_id", "event_type", "value"),
            ["user_id", "event_type"],
            sums=["value"],
        ).collect()
    }
    assert salted == plain


def test_stateful_running_profiles(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_us = (
        F.expr("ts div 1000")
        if dict(static.dtypes).get("ts") == "bigint"
        else F.unix_micros(F.col("ts").cast("timestamp"))
    )
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("user_id", ts_us.alias("ts_us"), "value")
    )
    name = f"profiles_{uuid.uuid4().hex[:8]}"
    q = (
        running_profiles(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="nerd_state_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # last update per user == batch ground truth
    got = {
        r.user_id: (r.total, r.last_us, round(r.max_value, 4))
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    truth = {
        r.user_id: (r.total, r.last_us, round(r.max_value, 4))
        for r in static.groupBy("user_id")
        .agg(
            F.count("*").alias("total"),
            F.max(ts_us).alias("last_us"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert got == truth
