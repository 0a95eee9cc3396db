"""Funnel/cohort ingest-maintained serve state (r10 verdict #2).

Pins the contracts behind funnel_stages' and cohort_retention's serve
paths:
- the per-user states are EXACTLY mergeable: per-batch folds equal the
  one-shot aggregation, including the late-data case that breaks any
  bounded scalar (t1..tk) state — a late stage-1 event lowering t1 and
  retroactively qualifying stage-2 timestamps;
- update_funnel_summary / update_cohort_summary rewrite only touched
  entity buckets and commit through the drop/touch _SUCCESS gate;
- the queries serve the result cache when fresh (values identical to
  the raw recompute), serve the state table when only the cache is
  unusable, and fall back to raw on staleness or meta mismatch.
"""

from __future__ import annotations

import pytest
import os

from pyspark.sql import functions as F

from nerd_spark.operators.funnels import (
    cohort_retention,
    cohort_state_to_per_user,
    cohort_user_state,
    funnel,
    funnel_rows_from_times,
    funnel_user_state,
    merge_cohort_state,
    merge_funnel_state,
    resolve_funnel_times,
    retention_from_per_user,
)
from nerd_spark.queries.analytics import cohort_retention_q, funnel_stages
from nerd_spark.sources import fsutil
from nerd_spark.sources.layout import (
    COHORT_DEFAULTS,
    FUNNEL_STAGES_DEFAULT,
    SUMMARY_COHORT_DIRNAME,
    SUMMARY_COHORT_RESULT_DIRNAME,
    SUMMARY_FUNNEL_DIRNAME,
    SUMMARY_FUNNEL_RESULT_DIRNAME,
    SUMMARY_META_NAME,
    update_cohort_summary,
    update_funnel_summary,
)

STAGES = list(FUNNEL_STAGES_DEFAULT)


def _mk_events(spark, n=900, users=40, start="2024-03-01 00:00:00"):
    # view/click/purchase/signup/error mix with repeated (user, day)
    # activity; ids interleave types across users and time
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (
            F.to_timestamp(F.lit(start))
            + F.make_interval(mins=(F.col("id") * 37 % 40_000).cast("int"))
        ).alias("ts"),
        F.when(F.col("id") % 17 == 0, F.lit(None)).otherwise(
            F.col("id") % users
        ).alias("user_id"),
        F.element_at(
            F.array(
                F.lit("view"), F.lit("click"), F.lit("purchase"),
                F.lit("signup"), F.lit("error"),
            ),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("event_type"),
        (F.col("id") % 97 / 7.0).alias("value"),
    )


def _rows(df):
    # repr-keyed sort: null user ids (kept by the funnel contract)
    # are not orderable against ints
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_funnel_fold_equals_one_shot(spark):
    ev = _mk_events(spark)
    a = ev.filter(F.col("event_id") % 3 != 0)
    b = ev.filter(F.col("event_id") % 3 == 0)
    one = funnel_user_state(ev, STAGES)
    folded = merge_funnel_state(
        funnel_user_state(a, STAGES), funnel_user_state(b, STAGES)
    )
    assert _rows(folded) == _rows(one)
    # commutativity
    rev = merge_funnel_state(
        funnel_user_state(b, STAGES), funnel_user_state(a, STAGES)
    )
    assert _rows(rev) == _rows(one)
    # resolved rows == the raw operator
    assert _rows(
        funnel_rows_from_times(resolve_funnel_times(folded, STAGES), STAGES)
    ) == _rows(funnel(ev, STAGES))


def test_funnel_late_data_requalification(spark):
    # batch 1: only a click at t=10 -> no stage-1, user converts
    # nowhere. batch 2 delivers a LATE view at t=5: t1 drops to 5 and
    # the already-seen click must re-qualify. Any folded scalar
    # (t1, t2) state discards the click in batch 1 and gets users=0
    # at stage 2; the set state keeps it (the exact-mergeability
    # argument in operators/funnels.py::funnel_user_state).
    b1 = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10", "click")], "u long, ts string, et string"
    ).select("u", F.to_timestamp("ts").alias("ts"), "et")
    b2 = spark.createDataFrame(
        [(1, "2024-01-01 00:00:05", "view")], "u long, ts string, et string"
    ).select("u", F.to_timestamp("ts").alias("ts"), "et")
    st = merge_funnel_state(
        funnel_user_state(b1, ["view", "click"], user_col="u", type_col="et"),
        funnel_user_state(b2, ["view", "click"], user_col="u", type_col="et"),
    )
    out = funnel_rows_from_times(
        resolve_funnel_times(st, ["view", "click"]), ["view", "click"]
    )
    assert [r.users for r in out.orderBy("stage_idx").collect()] == [1, 1]


def test_cohort_fold_equals_one_shot(spark):
    ev = _mk_events(spark)
    a = ev.filter(F.col("event_id") % 3 != 0)
    b = ev.filter(F.col("event_id") % 3 == 0)
    one = cohort_user_state(ev)
    folded = merge_cohort_state(cohort_user_state(a), cohort_user_state(b))
    assert _rows(folded) == _rows(one)
    # anchor present only in one batch still min-merges (map_zip_with
    # null side) and the resolution equals the raw operator
    assert _rows(
        retention_from_per_user(
            cohort_state_to_per_user(folded, "signup"), 7, 4
        )
    ) == _rows(cohort_retention(ev, "signup"))


def test_cohort_anchor_only_in_second_batch(spark):
    rows = [
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-09 00:00:00", "click"),
    ]
    b1 = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).select("user_id", F.to_timestamp("ts").alias("ts"), "event_type")
    b2 = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00", "signup")],
        "user_id long, ts string, event_type string",
    ).select("user_id", F.to_timestamp("ts").alias("ts"), "event_type")
    st = merge_cohort_state(cohort_user_state(b1), cohort_user_state(b2))
    got = _rows(
        retention_from_per_user(cohort_state_to_per_user(st, "signup"), 7, 2)
    )
    want = _rows(cohort_retention(b1.unionByName(b2), "signup"))
    assert got == want
    # day BEFORE the anchor (2024-01-01) is excluded; day 9 = period 1
    assert [(r[1], r[3]) for r in got] == [(0, 1), (1, 1)]


def _data_dir(spark, tmp_path):
    d = str(tmp_path / "data")
    _mk_events(spark).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    return d


@pytest.mark.slow
def test_incremental_maintenance_and_serve(spark, tmp_path):
    d = _data_dir(spark, tmp_path)
    ev = spark.read.parquet(os.path.join(d, "events.parquet"))
    a = ev.filter(F.col("event_id") < 500)
    b = ev.filter(F.col("event_id") >= 500)
    for batch in (a, b):
        update_funnel_summary(spark, d, batch)
        update_cohort_summary(spark, d, batch)
    # queries serve the result caches, values == raw recompute
    fs = funnel_stages(spark, d)
    assert any(SUMMARY_FUNNEL_RESULT_DIRNAME in f for f in fs.inputFiles())
    assert _rows(fs) == _rows(funnel(ev, STAGES))
    cr = cohort_retention_q(spark, d)
    assert any(SUMMARY_COHORT_RESULT_DIRNAME in f for f in cr.inputFiles())
    assert _rows(cr) == _rows(cohort_retention(ev, "signup"))


def test_state_tier_and_fallbacks(spark, tmp_path):
    d = _data_dir(spark, tmp_path)
    ev = spark.read.parquet(os.path.join(d, "events.parquet"))
    update_funnel_summary(spark, d, ev)
    update_cohort_summary(spark, d, ev)
    raw_f, raw_c = _rows(funnel(ev, STAGES)), _rows(
        cohort_retention(ev, "signup")
    )
    # kill only the result caches -> the STATE tier serves (scalar
    # t-columns / shared retention resolution), values unchanged
    for rd in (SUMMARY_FUNNEL_RESULT_DIRNAME, SUMMARY_COHORT_RESULT_DIRNAME):
        fsutil.delete(spark, os.path.join(d, rd, "_SUCCESS"))
    fs = funnel_stages(spark, d)
    assert any(SUMMARY_FUNNEL_DIRNAME in f for f in fs.inputFiles())
    assert _rows(fs) == raw_f
    cr = cohort_retention_q(spark, d)
    # inputFiles() is empty through the persisted join and the plan
    # text elides paths — the state table's ReadSchema (days/anchors,
    # never present on raw events) marks the serve tier
    assert (
        "anchors:map<string,date>"
        in cr._jdf.queryExecution().executedPlan().toString()
    )
    assert _rows(cr) == raw_c
    # meta mismatch on the state table -> raw fallback, still exact
    fsutil.write_text(
        spark,
        os.path.join(d, SUMMARY_FUNNEL_DIRNAME, SUMMARY_META_NAME),
        '{"stages": ["view", "purchase"]}',
    )
    fs2 = funnel_stages(spark, d)
    assert any("events.parquet" in f for f in fs2.inputFiles())
    assert _rows(fs2) == raw_f
    # staleness (events newer than the summaries) -> raw fallback
    # (raw also ends in the persisted join, so mark by the absence of
    # the state table's schema)
    ev.limit(0).write.mode("append").parquet(os.path.join(d, "events.parquet"))
    cr2 = cohort_retention_q(spark, d)
    assert (
        "anchors:map<string,date>"
        not in cr2._jdf.queryExecution().executedPlan().toString()
    )
    assert _rows(cr2) == raw_c


def test_bucket_bounded_rewrite(spark, tmp_path):
    d = _data_dir(spark, tmp_path)
    ev = spark.read.parquet(os.path.join(d, "events.parquet"))
    update_funnel_summary(spark, d, ev)
    spath = os.path.join(d, SUMMARY_FUNNEL_DIRNAME)
    before = {
        wb: fsutil.mtime(spark, os.path.join(spath, wb))
        for wb in fsutil.list_names(spark, spath)
        if wb.startswith("wb=")
    }
    assert len(before) > 1  # the boundedness claim needs >1 bucket
    one = ev.filter(
        F.col("user_id").isNotNull() & F.col("event_type").isin(STAGES)
    ).limit(1)
    update_funnel_summary(spark, d, one)
    after = {
        wb: fsutil.mtime(spark, os.path.join(spath, wb))
        for wb in fsutil.list_names(spark, spath)
        if wb.startswith("wb=")
    }
    touched = sum(1 for wb in before if after[wb] != before[wb])
    assert touched == 1
    # COHORT defaults meta pins the result binding
    update_cohort_summary(spark, d, ev)
    import json

    meta = json.loads(
        fsutil.read_text(
            spark,
            os.path.join(
                d, SUMMARY_COHORT_RESULT_DIRNAME, SUMMARY_META_NAME
            ),
        )
    )
    assert meta == COHORT_DEFAULTS


def test_funnel_stage_rebinding_refuses_fold(spark, tmp_path):
    """The funnel state's meta sidecar BINDS the stage list: folding a
    differently-staged batch into existing state would stamp the new
    binding over history that never retained those stage types (r11
    advisor) — the updater must raise, and a fresh dir at the new
    binding must build cleanly."""
    import pytest

    d = str(tmp_path / "data")
    ev = _mk_events(spark)
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    update_funnel_summary(spark, d, ev)
    with pytest.raises(ValueError, match="bound to stages"):
        update_funnel_summary(
            spark, d, ev, stages=["signup", "view", "purchase"]
        )
    # the default-binding state is untouched and still serves
    meta_path = os.path.join(d, SUMMARY_FUNNEL_DIRNAME)
    from nerd_spark.sources.layout import read_summary_meta

    assert read_summary_meta(spark, meta_path)["stages"] == STAGES
    # a fresh dir at the new binding builds from empty state
    d2 = str(tmp_path / "data2")
    ev.write.mode("overwrite").parquet(os.path.join(d2, "events.parquet"))
    update_funnel_summary(
        spark, d2, ev, stages=["signup", "view", "purchase"]
    )
    assert read_summary_meta(
        spark, os.path.join(d2, SUMMARY_FUNNEL_DIRNAME)
    )["stages"] == ["signup", "view", "purchase"]


def test_funnel_metaless_state_rebuilds_from_events(spark, tmp_path):
    """A state dir WITHOUT its binding sidecar is a crash artifact
    (tear between the first fold's state commit and meta write), not a
    caller error: the fold must rebuild exactly from the fact table
    for its own stages instead of wedging on a raise — and the rebuilt
    dir serves equal to a raw recompute. A real stage MISMATCH (meta
    present, different list) still raises."""
    d = str(tmp_path / "data")
    raw = str(tmp_path / "raw")
    ev = _mk_events(spark)
    b1 = ev.filter(F.col("event_id") % 2 == 0)
    b2 = ev.filter(F.col("event_id") % 2 == 1)
    b1.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    update_funnel_summary(spark, d, b1, batch_id="b1")
    # simulate the tear: binding sidecar gone, state + gate survive
    os.remove(
        os.path.join(d, SUMMARY_FUNNEL_DIRNAME, SUMMARY_META_NAME)
    )
    b2.write.mode("append").parquet(os.path.join(d, "events.parquet"))
    update_funnel_summary(spark, d, b2, batch_id="b2")

    ev.write.mode("overwrite").parquet(os.path.join(raw, "events.parquet"))

    def rows(df):
        return sorted(map(repr, (tuple(r) for r in df.collect())))

    assert rows(funnel_stages(spark, d)) == rows(funnel_stages(spark, raw))
    from nerd_spark.sources.layout import read_summary_meta

    assert read_summary_meta(
        spark, os.path.join(d, SUMMARY_FUNNEL_DIRNAME)
    )["stages"] == STAGES
