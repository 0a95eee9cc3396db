"""Regression: timestamp columns from the read boundary must be the
classic session-UTC TIMESTAMP, never TIMESTAMP_NTZ.

The driver's testdata has shipped both parquet TIMESTAMP(NANOS)
(read as bigint via the legacy conf and rebuilt) and plain no-tz
TIMESTAMP(MICROS) (which Spark 4's inferTimestampNTZ would surface
as TIMESTAMP_NTZ and break every unix_micros/date-math call site —
the exact failure CORRECTNESS_r03 recorded for fmp_score).
read_table normalizes either encoding; this pins it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nerd_spark.session import read_table


def test_no_ntz_from_read_table(spark, sf_dir):
    for name in ("events", "lineitem", "orders"):
        df = read_table(spark, sf_dir, name)
        ntz = [c for c, t in df.dtypes if "ntz" in t]
        assert not ntz, f"{name} surfaced TIMESTAMP_NTZ columns: {ntz}"


def test_unix_micros_works_on_events_ts(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    n = ev.select(F.unix_micros("ts").alias("us")).filter(F.col("us") > 0).count()
    assert n > 0


def test_fmp_queries_analyze_and_run(spark, sf_dir):
    # the two queries CORRECTNESS_r03 flagged; count() forces execution
    from nerd_spark.queries import REGISTRY

    assert REGISTRY["fmp_score"](spark, sf_dir).count() > 0
    assert REGISTRY["fmp_training_frame"](spark, sf_dir).count() > 0
