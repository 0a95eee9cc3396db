"""Round-8 layout upgrades: ingest-materialized unscaled-long money
measures and the co-partitioned orders||customer bucketed pair
(sources/layout.py) — value parity with the raw path plus the plan
shapes the 100 TB design claims."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from nerd_spark.queries import REGISTRY
from nerd_spark.queries.compare import normalize
from nerd_spark.session import read_table
from nerd_spark.sources.layout import (
    bucketed_pair,
    bucketed_pair_names,
    optimize_layout,
)


@pytest.fixture(scope="module")
def layout_dir(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="nerd_layout_r8_")
    optimize_layout(spark, sf_dir, out)
    yield out
    ot, ct = bucketed_pair_names(out)
    spark.sql(f"DROP TABLE IF EXISTS {ot}")
    spark.sql(f"DROP TABLE IF EXISTS {ct}")


def test_u4_columns_materialized_and_bit_equal(spark, sf_dir, layout_dir):
    """The stored longs equal the on-the-fly _unscaled of the raw
    doubles row-for-row (serve parity is derivable either way)."""
    from nerd_spark.queries.base import _unscaled

    li = read_table(spark, layout_dir, "lineitem")
    for c in ("l_extendedprice_u4", "l_discprice_u4", "l_charge_u4",
              "l_discount_u4"):
        assert c in li.columns
    mismatch = li.filter(
        (F.col("l_extendedprice_u4") != _unscaled("l_extendedprice"))
        | (F.col("l_discount_u4") != _unscaled("l_discount"))
    ).count()
    assert mismatch == 0


def test_q1_a16_identical_raw_vs_layout(spark, sf_dir, layout_dir):
    for name in ("q1_pricing_summary", "a16_rollup_revenue"):
        a = normalize(REGISTRY[name](spark, sf_dir).toPandas())
        b = normalize(REGISTRY[name](spark, layout_dir).toPandas())
        assert a.equals(b), name


def test_q1_layout_scan_reads_longs_not_doubles(spark, layout_dir):
    """On an optimized dir the q1 scan must NOT read the money doubles
    at all — the whole point of the materialization (ReadSchema
    prunes to the u4 longs + group/filter columns)."""
    df = REGISTRY["q1_pricing_summary"](spark, layout_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "ReadSchema" in l and "lineitem" in l]
    assert scan, plan
    assert "l_extendedprice_u4" in scan[0]
    assert "l_extendedprice:" not in scan[0].replace("l_extendedprice_u4", "")
    assert "l_tax" not in scan[0]


def test_bucketed_pair_join_no_exchange_no_sort(spark, layout_dir):
    """Past the broadcast threshold, the custkey join over the
    co-partitioned pair plans SortMergeJoin on bucketed scans with
    ZERO Exchange and ZERO Sort on either input — the shuffle the r7
    verdict flagged is gone at ingest."""
    pair = bucketed_pair(spark, layout_dir)
    assert pair is not None
    o, c = pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = o.join(c.select("c_custkey", "c_nationkey"),
                   o.o_custkey == c.c_custkey)
        j.write.format("noop").mode("overwrite").save()
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    assert "Sort " not in plan.replace("SortMergeJoin", "SMJ"), plan


def test_a16_uses_bucketed_pair_when_present(spark, layout_dir):
    """a16 on an optimized dir must read the catalog pair (bucketed
    scan) and the stored o_totalprice_u4 longs."""
    df = REGISTRY["a16_rollup_revenue"](spark, layout_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    ot, _ = bucketed_pair_names(layout_dir)
    assert "Bucketed: true" in plan or ot in plan
    assert "o_totalprice_u4" in plan
