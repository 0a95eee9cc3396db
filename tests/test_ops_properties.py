"""Property-based op-algebra tests (SURVEY §5.4): hypothesis-generated
op sequences, checking the algebraic laws the engine's columnar fast
path relies on (pure Python fold — no Spark session needed)."""

from __future__ import annotations

import pytest
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from nerd_spark.operators.merge import apply_op, fold_ops

# The commutativity law holds per (key, op-type): a stream of `add`s
# on one key commutes, as do setmax/setmin/add_to_set streams — but
# MIXED op types on one key do not (hypothesis found add;setmin !=
# setmin;add immediately). The columnar fast path aggregates exactly
# per (key, op-type), so that is the law stated here.
_OP_TYPE = st.sampled_from(["add", "setmax", "setmin", "add_to_set"])
_COMMUTING = st.tuples(
    _OP_TYPE,
    _OP_TYPE,
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=1,
        max_size=20,
    ),
)


def _apply_all(op_a, op_b, ops):
    rec: dict = {}
    for key, v in ops:
        apply_op(rec, op_a if key == "a" else op_b, key, {"value": v})
    return rec


@given(_COMMUTING, st.randoms())
@settings(max_examples=200, deadline=None)
def test_commuting_ops_are_order_insensitive(spec, rnd):
    op_a, op_b, ops = spec
    shuffled = list(ops)
    rnd.shuffle(shuffled)
    a, b = _apply_all(op_a, op_b, ops), _apply_all(op_a, op_b, shuffled)
    for key in ("a", "b"):
        va, vb = a.get(key), b.get(key)
        if isinstance(va, list) or isinstance(vb, list):
            assert set(va or []) == set(vb or [])
        else:
            assert va == vb


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["set", "add", "remove", "setmax"]),
            st.sampled_from(["x", "y.z"]),
            st.integers(min_value=-10, max_value=10),
        ),
        min_size=1,
        max_size=15,
    )
)
@settings(max_examples=200, deadline=None)
def test_fold_is_deterministic_and_pure(ops):
    """Same ordered sequence -> same record; folding never mutates
    its inputs across runs (replay determinism)."""
    triples = [(op, key, {"value": v}) for op, key, v in ops]
    r1 = fold_ops(None, triples, eid="e")
    r2 = fold_ops(None, triples, eid="e")
    assert r1 == r2


@given(st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_add_to_set_idempotent(vals):
    rec: dict = {}
    for v in vals:
        apply_op(rec, "add_to_set", "s", {"value": v})
    once = list(rec["s"])
    for v in vals:  # replay: no change
        apply_op(rec, "add_to_set", "s", {"value": v})
    assert rec["s"] == once
    assert sorted(set(vals)) == sorted(rec["s"])


@given(
    st.dictionaries(
        st.sampled_from(["d1", "d2", "d3"]),
        st.integers(min_value=1, max_value=5),
        min_size=1,
    )
)
@settings(max_examples=100, deadline=None)
def test_array_upsert_equals_groupby_semantics(counts):
    """A stream of array_upsert {date: d} add n ops must equal the
    per-date sum — the A1 aggregation-form equivalence (SURVEY §2.4
    array_upsert -> explode/groupBy/collect rewrite)."""
    rec: dict = {}
    stream = [d for d, c in counts.items() for _ in range(c)]
    random.Random(42).shuffle(stream)
    for d in stream:
        apply_op(
            rec,
            "array_upsert",
            "events",
            {"query": {"date": d}, "ops": [["add", "n", {"value": 1}]]},
        )
    got = {e["date"]: e["n"] for e in rec["events"]}
    assert got == counts


def test_merge_changelog_equals_sequential_fold(spark):
    """Distributed merge (cogrouped applyInPandas) == a sequential
    driver-side fold of the same changelog, for a randomized op mix
    across many entities — the per-key serialization guarantee."""
    import json
    import random

    from nerd_spark.operators.merge import merge_changelog

    rng = random.Random(7)
    ops_rows = []
    for seq in range(400):
        eid = f"e{rng.randrange(12)}"
        op = rng.choice(
            ["set", "add", "setmax", "add_to_set", "append", "remove", "*add"]
        )
        key = rng.choice(["n", "tags", "meta.x", "meta.y"])
        if op in ("add_to_set", "append"):
            key = "tags"
        params = {"value": rng.randrange(10)}
        if op == "remove":
            params = {}
        ops_rows.append((seq, eid, op, key, json.dumps(params)))

    # sequential truth
    from nerd_spark.operators.merge import fold_ops

    truth: dict[str, dict | None] = {}
    by_eid: dict[str, list] = {}
    for seq, eid, op, key, params in ops_rows:
        by_eid.setdefault(eid, []).append((seq, op, key, json.loads(params)))
    for eid, rows in by_eid.items():
        rows.sort()
        rec = fold_ops(None, [(o, k, p) for _, o, k, p in rows], eid=eid)
        if rec is not None:
            truth[eid] = rec

    entities = spark.createDataFrame([], "eid string, record string")
    changelog = spark.createDataFrame(
        ops_rows, "seq long, eid string, op string, key string, params string"
    )
    got = {
        r.eid: json.loads(r.record)
        for r in merge_changelog(entities, changelog).collect()
    }
    assert got == truth


# ---------------------------------------------------------------------------
# Reputation math: Spark column plan == reference-loop fold
# ---------------------------------------------------------------------------


def _ref_partial_reputation(day_data, p):
    """Direct transcription of the reference loop
    (reputation.py:111-136): iterate EVERY day of the range,
    nonlin(events) [* nonlin(detectors)], decay weight, weighted mean
    over the full-range weight sum."""

    def nonlin(val, scale, coef=0.5, cap=20):
        vs = float(val) / scale
        return 1.0 if vs > cap else 1 - coef**vs

    sum_w, rep = 0.0, 0.0
    for d in range(p.date_range):
        ne, nd = day_data.get(d, (0, 0))
        daily = nonlin(ne, p.scale_events, p.coef_events)
        if p.has_detectors:
            daily *= nonlin(nd, p.scale_detectors, p.coef_detectors)
        if p.time_decay == "linear":
            w = float(p.date_range - d) / p.date_range
        elif p.time_decay == "half_life":
            w = 0.5 ** (float(d) / p.half_life)
        else:
            w = 1.0
        sum_w += w
        rep += daily * w
    # HALF_UP at 6 dp, matching Spark's round() and the DuckDB oracle;
    # Python's built-in round is banker's and diverges on exact .5
    # boundaries (hypothesis found rep/sum_w == 0.0703125 exactly at
    # scale=1.5 -> banker's gives ...312, the engine/oracle ...313)
    import decimal

    if not sum_w:
        return 0.0
    return float(
        decimal.Decimal(rep / sum_w).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )


@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=13),
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=10,
    ),
    st.sampled_from(["none", "linear", "half_life"]),
    st.booleans(),
    st.floats(min_value=0.5, max_value=50),
)
@settings(max_examples=12, deadline=None)
@pytest.mark.slow
def test_partial_reputation_matches_reference_loop(
    spark, day_data, decay, detectors, scale
):
    import datetime as dt

    from nerd_spark.plans.reputation import SourceParams, partial_reputation

    p = SourceParams(
        scale_events=scale, scale_detectors=3.0, date_range=14,
        time_decay=decay, half_life=2.5, has_detectors=detectors,
    )
    anchor = dt.date(2024, 6, 30)
    rows = [
        (1, anchor - dt.timedelta(days=age), ne, nd)
        for age, (ne, nd) in day_data.items()
    ]
    daily = spark.createDataFrame(
        rows, "entity long, d date, num_events long, num_detectors long"
    )
    as_of = spark.createDataFrame(
        [(dt.datetime(2024, 6, 30, 12, 0),)], "as_of timestamp"
    )
    [row] = partial_reputation(daily, as_of, p).collect()
    assert row.rep == _ref_partial_reputation(day_data, p)
