"""The ingest-written summary table must be transparent: A-family
results over a layout-optimized dir (summary present) are identical
to the raw-events computation the oracle checks."""

from __future__ import annotations

import os
import tempfile

import pytest

from nerd_spark.queries import REGISTRY
from nerd_spark.sources.layout import SUMMARY_DAILY_DIRNAME, optimize_layout

_QUERIES = [
    "a1_daily_rollup",
    "a2_window_totals",
    "a3_ewma",
    "a7_total_reputation",
    "op_array_upsert_rebuild",
    "a11_distinct_pair_counts",
]


@pytest.fixture(scope="module")
def layout_dir(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="nerd_summary_test_")
    optimize_layout(spark, sf_dir, out)
    assert os.path.exists(
        os.path.join(out, SUMMARY_DAILY_DIRNAME, "_SUCCESS")
    ), "layout pass did not write the summary table"
    return out


@pytest.mark.parametrize("name", _QUERIES)
def test_summary_path_equals_raw(spark, sf_dir, layout_dir, name):
    raw = {tuple(r) for r in REGISTRY[name](spark, sf_dir).collect()}
    summ = {tuple(r) for r in REGISTRY[name](spark, layout_dir).collect()}
    assert summ == raw
