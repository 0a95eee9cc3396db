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


# ---------------------------------------------------------------------------
# Exact money aggregation: summing 2-decimal doubles in floating point is
# order-dependent, and groupBy order differs between Spark and DuckDB —
# at rounding boundaries the value-hash flips. Accumulate in DECIMAL
# (exact) and convert to double only at the end, identically on both
# sides. Division (for avg) happens in double on identical operands.
# ---------------------------------------------------------------------------


# The row value is rounded in DOUBLE first (the per-row double is
# bit-identical across engines, and engines' double->decimal rounding
# rules differ at the quantum), making the decimal cast unambiguous.


def _dec(col):
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, 4).cast("decimal(18,4)")


def exact_sum(col, alias: str, ndigits: int = 2):
    """Spark: exact decimal sum of a ~2-dp double column -> rounded double."""
    from pyspark.sql import functions as F

    return F.round(F.sum(_dec(col)).cast("double"), ndigits).alias(alias)


def exact_avg(col, alias: str, ndigits: int = 6):
    """Spark: exact-sum / count in double, rounded."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(_dec(col)).cast("double") / F.count(c), ndigits).alias(alias)


def dec_sql(expr: str) -> str:
    return f"CAST(round({expr}, 4) AS DECIMAL(18,4))"
