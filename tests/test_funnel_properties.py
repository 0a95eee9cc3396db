"""Property-based funnel / cohort tests: hypothesis-generated event
sets checked against brute-force pure-Python references (the §5.4
discipline applied to the value-semantics contracts — the operators'
results must be pure functions of the event VALUES, independent of
row order and partitioning)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nerd_spark.operators.funnels import cohort_retention, funnel
import pytest

_STAGES = ["view", "click", "purchase"]
_TYPES = _STAGES + ["other"]

_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # user
        st.integers(min_value=0, max_value=50),  # ts (seconds; ties likely)
        st.sampled_from(_TYPES),
    ),
    min_size=0,
    max_size=40,
)


def _mk_df(spark, rows):
    df = spark.createDataFrame(
        [(u, t, et) for (u, t, et) in rows] or [(None, None, None)],
        "user_id int, sec int, event_type string",
    )
    if not rows:
        df = df.filter(F.lit(False))
    return df.select(
        "user_id",
        F.timestamp_seconds("sec").alias("ts"),
        "event_type",
    )


def _ref_funnel(rows):
    users = {u for u, _, _ in rows}
    counts = []
    reach = {u: None for u in users}
    for st_name in _STAGES:
        nxt = {}
        for u in users:
            prev = reach[u]
            if st_name != _STAGES[0] and prev is None:
                continue
            cand = [
                t
                for (uu, t, et) in rows
                if uu == u
                and et == st_name
                and (st_name == _STAGES[0] or t >= prev)
            ]
            if cand:
                nxt[u] = min(cand)
        reach = {u: nxt.get(u) for u in users}
        counts.append(len(nxt))
    return counts


@given(_EVENTS)
@settings(max_examples=12, deadline=None)
def test_funnel_matches_bruteforce(spark, rows):
    got = {
        r.stage_idx: r.users
        for r in funnel(_mk_df(spark, rows), _STAGES).collect()
    }
    want = _ref_funnel(rows)
    assert [got[i + 1] for i in range(len(_STAGES))] == want


_DAY_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # user
        st.integers(min_value=0, max_value=45),  # day offset
        st.sampled_from(["signup", "other"]),
    ),
    min_size=0,
    max_size=40,
)


def _ref_cohort(rows, period_days=7, n_periods=4):
    import datetime

    base = datetime.date(2024, 1, 1)
    d0 = {}
    for u, d, et in rows:
        if et == "signup":
            d0[u] = min(d0.get(u, d), d)
    sizes: dict = {}
    for u, a in d0.items():
        cd = (base + datetime.timedelta(days=a)).isoformat()
        sizes[cd] = sizes.get(cd, 0) + 1
    active: dict = {}
    for u, a in d0.items():
        cd = (base + datetime.timedelta(days=a)).isoformat()
        periods = {
            (d - a) // period_days
            for (uu, d, _) in rows
            if uu == u and d >= a and (d - a) // period_days < n_periods
        }
        for p in periods:
            active[(cd, p)] = active.get((cd, p), 0) + 1
    return {
        (cd, p): (sizes[cd], n, round(n / sizes[cd], 6))
        for (cd, p), n in active.items()
    }


@given(_DAY_EVENTS)
@settings(max_examples=12, deadline=None)
@pytest.mark.slow
def test_cohort_matches_bruteforce(spark, rows):
    df = spark.createDataFrame(
        [(u, f"2024-01-01", d, et) for (u, d, et) in rows]
        or [(None, None, None, None)],
        "user_id int, base string, off int, event_type string",
    )
    if not rows:
        df = df.filter(F.lit(False))
    ev = df.select(
        "user_id",
        (
            F.to_timestamp("base") + F.make_dt_interval(F.col("off"))
        ).alias("ts"),
        "event_type",
    )
    got = {
        (r.cohort_date, r.period): (
            r.cohort_size,
            r.active_users,
            r.retention,
        )
        for r in cohort_retention(ev, "signup").collect()
    }
    assert got == _ref_cohort(rows)


@given(_EVENTS, st.integers(min_value=1, max_value=3))
@settings(max_examples=12, deadline=None)
@pytest.mark.slow
def test_funnel_state_fold_equals_one_shot(spark, rows, mod):
    """The serve-table fold algebra (tests the r11 ingest-maintained
    state): split an arbitrary event set into batches by any rule,
    fold the per-batch states, resolve — identical to the one-shot
    batch funnel (and the brute-force reference). Exercises the
    late-data case by construction: hypothesis freely puts a user's
    stage-1 event in a later batch than their stage-2 event."""
    from nerd_spark.operators.funnels import (
        funnel_rows_from_times,
        funnel_user_state,
        merge_funnel_state,
        resolve_funnel_times,
    )

    df = _mk_df(spark, rows)
    parts = [
        df.filter(
            F.crc32(F.concat_ws("|", "user_id", "ts", "event_type"))
            % (mod + 1) == i
        )
        for i in range(mod + 1)
    ]
    state = funnel_user_state(parts[0], _STAGES)
    for p in parts[1:]:
        state = merge_funnel_state(state, funnel_user_state(p, _STAGES))
    folded = {
        r.stage_idx: r.users
        for r in funnel_rows_from_times(
            resolve_funnel_times(state, _STAGES), _STAGES
        ).collect()
    }
    one = {r.stage_idx: r.users for r in funnel(df, _STAGES).collect()}
    assert folded == one


@given(_EVENTS, st.integers(min_value=1, max_value=3))
@settings(max_examples=12, deadline=None)
@pytest.mark.slow
def test_cohort_state_fold_equals_one_shot(spark, rows, mod):
    from nerd_spark.operators.funnels import (
        cohort_state_to_per_user,
        cohort_user_state,
        merge_cohort_state,
        retention_from_per_user,
    )

    df = _mk_df(spark, rows)
    parts = [
        df.filter(
            F.crc32(F.concat_ws("|", "user_id", "ts", "event_type"))
            % (mod + 1) == i
        )
        for i in range(mod + 1)
    ]
    state = cohort_user_state(parts[0])
    for p in parts[1:]:
        state = merge_cohort_state(state, cohort_user_state(p))
    folded = sorted(
        map(
            repr,
            retention_from_per_user(
                cohort_state_to_per_user(state, "view"), 7, 4
            ).collect(),
        )
    )
    one = sorted(map(repr, cohort_retention(df, "view").collect()))
    assert folded == one
