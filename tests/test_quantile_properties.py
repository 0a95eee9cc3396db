"""Property-based value-histogram serve tests: hypothesis-generated
event sets, split into arbitrary batch sequences, folded through
seed_value_hist + update_value_hist_summary, and the served quantiles
checked against a brute-force pure-Python quantile_disc reference —
the fold must be a pure function of the event VALUES, independent of
batch boundaries (the §5.4 discipline applied to the quantile serve
tier)."""

from __future__ import annotations
import pytest

import math
import os

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nerd_spark.queries.dataprep import (
    quantile_by_event_type,
    quantile_event_values,
)
from nerd_spark.sources.layout import (
    QUANTILE_BY_PROBS_DEFAULT,
    QUANTILE_PROBS_DEFAULT,
    seed_value_hist,
    update_value_hist_summary,
)

_TYPES = ["view", "click", None]

# (event_type, value) pairs; values on a small grid so ties and
# cross-type collisions are likely; None values exercise the null
# exclusion, None types the null-group contract
_EVENTS = st.lists(
    st.tuples(
        st.sampled_from(_TYPES),
        st.one_of(st.none(), st.integers(min_value=-5, max_value=12)),
    ),
    min_size=1,
    max_size=30,
)


def _mk_dir(spark, tmpdir, rows):
    d = str(tmpdir)
    df = spark.createDataFrame(
        [(i, et, None if v is None else v / 4.0) for i, (et, v) in enumerate(rows)],
        "event_id long, event_type string, value double",
    )
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d, df


def _ref_quantiles(vals, probs):
    vs = sorted(v for v in vals if v is not None)
    if not vs:
        return {}
    return {
        p: vs[max(1, math.ceil(p * len(vs))) - 1] for p in probs
    }


@given(_EVENTS, st.integers(min_value=1, max_value=3))
@settings(max_examples=8, deadline=None)
@pytest.mark.slow
def test_value_hist_fold_split_invariant(spark, tmp_path_factory, rows, k):
    d, df = _mk_dir(spark, tmp_path_factory.mktemp("vh"), rows)
    # arbitrary batch split: seed with slice 0, fold the rest
    seed_value_hist(spark, d, df.filter(F.col("event_id") % k == 0))
    for i in range(1, k):
        update_value_hist_summary(
            spark, d, df.filter(F.col("event_id") % k == i), batch_id=f"b{i}"
        )
    vals = [None if v is None else v / 4.0 for _, v in rows]
    want_g = _ref_quantiles(vals, QUANTILE_PROBS_DEFAULT)
    got_g = {r.p: r.value for r in quantile_event_values(spark, d).collect()}
    if want_g:
        assert got_g == want_g
    else:
        assert got_g == {}
    # per-group (null groups kept; groups with only-null values absent)
    want_by = {}
    for et in set(et for et, _ in rows):
        gv = [None if v is None else v / 4.0 for t, v in rows if t == et]
        for p, val in _ref_quantiles(gv, QUANTILE_BY_PROBS_DEFAULT).items():
            want_by[(et, p)] = val
    got_by = {
        (r.event_type, r.p): r.value
        for r in quantile_by_event_type(spark, d).collect()
    }
    assert got_by == want_by
