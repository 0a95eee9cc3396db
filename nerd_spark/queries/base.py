"""Registry plumbing + shared fragments for the query inventory."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from nerd_spark.session import read_table

REGISTRY: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark_fn, oracle_sql) pair. oracle=None -> the
    driver records a weaker rows-only check (non-SQL-expressible op).
    """

    def deco(fn):
        REGISTRY[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# SQL fragment: the reputation nonlinearity 1 - 0.5^(v/s), capped at 1
# (reference: NERDd/modules/reputation.py:16-21). Keep in sync with
# nerd_spark.functions.mathx.nonlin.
def nonlin_sql(v: str, scale: float) -> str:
    return f"least(1.0 - pow(0.5, ({v}) / {scale}), 1.0)"
