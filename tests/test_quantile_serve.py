"""Ingest-maintained value-histogram serve tables for the quantile
family (r11 verdict #2).

Pins: the additive fold equals the one-shot build; the quantile
queries serve the tables when fresh with values identical to the raw
exact operators (including null event_type groups and null-value
exclusion); a replayed batch doesn't double-count; the growth guard
deletes an over-bound histogram and the queries fall back to the
bracket path; staleness falls back to raw.
"""

from __future__ import annotations
import pytest

import os

from pyspark.sql import functions as F

from nerd_spark.operators import sketches as SK
from nerd_spark.sources import fsutil
from nerd_spark.queries.dataprep import (
    quantile_by_event_type,
    quantile_event_values,
)
from nerd_spark.sources.layout import (
    SUMMARY_QUANTILE_BY_RESULT_DIRNAME,
    SUMMARY_QUANTILE_RESULT_DIRNAME,
    SUMMARY_VALUE_COUNTS_DIRNAME,
    SUMMARY_VALUE_HIST_DIRNAME,
    seed_value_hist,
    update_value_hist_summary,
)

PROBS_G = [0.25, 0.5, 0.9, 0.99]
PROBS_BY = [0.5, 0.95]


def _mk_events(spark, n=900, users=30, start="2024-03-01 00:00:00"):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (
            F.to_timestamp(F.lit(start))
            + F.make_interval(mins=(F.col("id") * 11 % 30_000).cast("int"))
        ).alias("ts"),
        F.pmod("id", F.lit(users)).alias("user_id"),
        F.when(F.col("id") % 19 == 0, F.lit(None)).otherwise(
            F.element_at(
                F.array(
                    F.lit("view"), F.lit("click"), F.lit("purchase"),
                    F.lit("signup"), F.lit("error"),
                ),
                (F.col("id") % 5 + 1).cast("int"),
            )
        ).alias("event_type"),
        # bounded domain with NULLs and cross-type value collisions
        F.when(F.col("id") % 13 == 0, F.lit(None)).otherwise(
            F.col("id") % 83 / 4.0
        ).alias("value"),
    )


def _rows(df):
    return sorted(map(repr, (tuple(r) for r in df.collect())))


def _data_dir(spark, tmp_path):
    d = str(tmp_path / "data")
    _mk_events(spark).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    return d


@pytest.mark.slow
def test_fold_equals_one_shot_and_serves(spark, tmp_path):
    d = _data_dir(spark, tmp_path)
    ev = spark.read.parquet(os.path.join(d, "events.parquet"))
    a = ev.filter(F.col("event_id") % 3 != 0)
    b = ev.filter(F.col("event_id") % 3 == 0)
    seed_value_hist(spark, d, a)
    update_value_hist_summary(spark, d, b)
    # folded pair histogram == one-shot grain counts (null types KEPT,
    # null values excluded)
    folded = spark.read.parquet(
        os.path.join(d, SUMMARY_VALUE_HIST_DIRNAME)
    ).select("et", "v", "cnt")
    one = (
        ev.filter(F.col("value").isNotNull())
        .groupBy(F.col("event_type").alias("et"), F.col("value").alias("v"))
        .agg(F.count("*").alias("cnt"))
    )
    assert _rows(folded) == _rows(one)
    # global projection == pair table collapsed
    vc = spark.read.parquet(os.path.join(d, SUMMARY_VALUE_COUNTS_DIRNAME))
    assert _rows(vc) == _rows(folded.groupBy("v").agg(F.sum("cnt").alias("cnt")))
    # tier 1: the meta-bound resolved result caches (file reads)
    raw_g = _rows(SK.exact_quantiles(ev, "value", PROBS_G))
    raw_by = _rows(SK.exact_quantiles_by(ev, "event_type", "value", PROBS_BY))
    g = quantile_event_values(spark, d)
    assert any(SUMMARY_QUANTILE_RESULT_DIRNAME in f for f in g.inputFiles())
    assert _rows(g) == raw_g
    by = quantile_by_event_type(spark, d)
    assert any(
        SUMMARY_QUANTILE_BY_RESULT_DIRNAME in f for f in by.inputFiles()
    )
    assert _rows(by) == raw_by
    # tier 2: result caches unusable -> the histogram tier resolves
    # the same values in-plan
    for rd in (
        SUMMARY_QUANTILE_RESULT_DIRNAME,
        SUMMARY_QUANTILE_BY_RESULT_DIRNAME,
    ):
        fsutil.delete(spark, os.path.join(d, rd, "_SUCCESS"))
    g2 = quantile_event_values(spark, d)
    assert any(SUMMARY_VALUE_COUNTS_DIRNAME in f for f in g2.inputFiles())
    assert _rows(g2) == raw_g
    by2 = quantile_by_event_type(spark, d)
    assert any(SUMMARY_VALUE_HIST_DIRNAME in f for f in by2.inputFiles())
    assert _rows(by2) == raw_by


def test_replay_does_not_double_count(spark, tmp_path):
    d = _data_dir(spark, tmp_path)
    ev = spark.read.parquet(os.path.join(d, "events.parquet"))
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    seed_value_hist(spark, d, a)
    update_value_hist_summary(spark, d, b, batch_id="b2")
    update_value_hist_summary(spark, d, b, batch_id="b2")  # replay
    folded = spark.read.parquet(
        os.path.join(d, SUMMARY_VALUE_HIST_DIRNAME)
    ).select("et", "v", "cnt")
    one = (
        ev.filter(F.col("value").isNotNull())
        .groupBy(F.col("event_type").alias("et"), F.col("value").alias("v"))
        .agg(F.count("*").alias("cnt"))
    )
    assert _rows(folded) == _rows(one)


def test_growth_guard_deletes_and_falls_back(spark, tmp_path):
    d = _data_dir(spark, tmp_path)
    ev = spark.read.parquet(os.path.join(d, "events.parquet"))
    seed_value_hist(spark, d, ev.filter(F.col("event_id") % 2 == 0))
    # a fold whose merged histogram exceeds the bound tears the serve
    # tables down — the probe then routes the queries to the bracket
    # path, exact either way
    update_value_hist_summary(
        spark, d, ev.filter(F.col("event_id") % 2 == 1), max_rows=10
    )
    assert not os.path.exists(
        os.path.join(d, SUMMARY_VALUE_HIST_DIRNAME, "_SUCCESS")
    )
    assert not os.path.exists(
        os.path.join(d, SUMMARY_VALUE_COUNTS_DIRNAME, "_SUCCESS")
    )
    # serve dirs gone -> the query's raw path (inputFiles is empty
    # through the histogram path's persist, so assert on values)
    g = quantile_event_values(spark, d)
    assert _rows(g) == _rows(SK.exact_quantiles(ev, "value", PROBS_G))


def test_staleness_falls_back_to_raw(spark, tmp_path):
    d = _data_dir(spark, tmp_path)
    ev = spark.read.parquet(os.path.join(d, "events.parquet"))
    seed_value_hist(spark, d)
    raw_g = _rows(SK.exact_quantiles(ev, "value", PROBS_G))
    raw_by = _rows(SK.exact_quantiles_by(ev, "event_type", "value", PROBS_BY))
    # bump events past the summaries: gates must refuse, results exact
    ev.limit(0).write.mode("append").parquet(os.path.join(d, "events.parquet"))
    g = quantile_event_values(spark, d)
    # the stale serve table's column names never appear in the scan
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert SUMMARY_VALUE_COUNTS_DIRNAME not in plan
    assert _rows(g) == raw_g
    assert _rows(quantile_by_event_type(spark, d)) == raw_by


def test_unseeded_dir_is_noop(spark, tmp_path):
    d = _data_dir(spark, tmp_path)
    ev = spark.read.parquet(os.path.join(d, "events.parquet"))
    update_value_hist_summary(spark, d, ev)  # no seed -> no-op
    assert not os.path.exists(os.path.join(d, SUMMARY_VALUE_HIST_DIRNAME))
    g = quantile_event_values(spark, d)
    assert _rows(g) == _rows(SK.exact_quantiles(ev, "value", PROBS_G))
