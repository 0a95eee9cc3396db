"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in ``nerd_spark.queries`` (one module per
operator family); this file only adapts it to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-shaped pricing summary over lineitem: scan + pushed-down
    filter + partial/final hash aggregation (see
    nerd_spark/queries/relational.py::q1_pricing_summary).
    """
    from nerd_spark.queries import REGISTRY

    return REGISTRY["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from nerd_spark.queries import REGISTRY

    return dict(REGISTRY)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checked query; entries
    absent here get the driver's weaker rows-only check."""
    from nerd_spark.queries import ORACLE

    return dict(ORACLE)
