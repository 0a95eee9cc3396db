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


# Shared DuckDB CTE fragment for the A6 per-source reputation (warden
# extractor): 14-day linear-decay weighted mean of nonlin(events) *
# nonlin(cats) (reference: NERDd/modules/reputation.py:111-221). Lives
# here (not in analytics.py) so surface.py's oracles can reuse it
# without forcing analytics to register first.
_REP_DENOM_14 = sum((14 - a) / 14 for a in range(14))

_REP_SQL = f"""
  daily AS (
    SELECT user_id AS entity, CAST(ts AS DATE) AS d, event_type AS cat,
           count(*) AS n
    FROM events GROUP BY 1, 2, 3
  ),
  as_of AS (SELECT max(ts) AS as_of FROM events),
  per_day AS (
    SELECT entity, d, sum(n) AS nd, count(DISTINCT cat) AS cats
    FROM daily, as_of
    WHERE date_diff('day', d, CAST(as_of AS DATE)) < 14
    GROUP BY 1, 2
  ),
  rep AS (
    SELECT entity,
           round(sum({nonlin_sql("nd", 5.0)} * {nonlin_sql("cats", 2.0)}
                     * (14 - date_diff('day', d, CAST(as_of AS DATE))) / 14.0)
                 / {_REP_DENOM_14}, 6) AS rep_events
    FROM per_day, as_of GROUP BY 1
  )
"""


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
