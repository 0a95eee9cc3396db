"""Skew-aware aggregation: two-phase salted groupBy.

AQE's skew-join splitting handles joins, but a groupBy on a hot key
(one IP producing a large share of all events — routine in security
telemetry) still funnels that key's rows into one reducer. Salting
splits the hot key across `buckets` partial groups, then a second,
tiny aggregation folds the partials. Works for any algebraic
aggregate (sum/count/min/max — the §2.4 commutative op set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_rollup(
    df: DataFrame,
    keys: list[str],
    sums: list[str] | None = None,
    buckets: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(count(*) as n, sum(c) for c in sums) computed
    as salt-partial + final. Output: keys + n + sum_<c> columns.

    The salt column is deterministic (hash of all columns mod
    buckets via spark_partition_id-free expression) so replays
    produce identical partials.
    """
    sums = sums or []
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(buckets)).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            F.count("*").alias("_n"),
            *[F.sum(c).alias(f"_s_{c}") for c in sums],
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n"),
        *[F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sums],
    )
