"""Range and as-of join operators (SURVEY §2.3 J4/J5).

The reference's point-in-range lookups (IP -> IANA allocation block
via bisect, reference: NERDd/modules/whois.py:194-238; prefix
blacklist via Redis sorted-set trick, redis_bl.py:46-57) map to two
Spark strategies:

- broadcast_range_join: small dim (<= ~100k blocks) -> broadcast
  nested-loop with the BETWEEN predicate; Catalyst evaluates it in
  codegen. This is J4 as shipped in the reference's data sizes.
- bucketed_range_join: the scale path — expand each range into the
  fixed-width buckets it covers, equi-join on bucket, re-check the
  exact predicate. Turns O(probe x dim) into a shuffle hash join;
  bucket width trades dim-row duplication against probe fan-out.

- asof_join: union + window carry-forward — the classic merge-asof
  without a range blowup: one shuffle on the key, last preceding
  right row carried to each left row by a running window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def broadcast_range_join(
    probe: DataFrame, dim: DataFrame, value_col: str, lo_col: str, hi_col: str
) -> DataFrame:
    """probe rows matched to ranges [lo, hi] inclusive; dim broadcast."""
    return probe.join(
        F.broadcast(dim),
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) <= F.col(hi_col)),
    )


def bucketed_range_join(
    probe: DataFrame,
    dim: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
) -> DataFrame:
    """Equi-join on bucket id, then exact range re-check.

    dim rows explode into ceil((hi-lo)/width)+1 bucket rows; pick
    width near the median range size so duplication stays O(1) per
    range. For /24-ish IP blocks, width 256 gives exactly 1-2 buckets
    per block.
    """
    exp_dim = dim.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(lo_col) / bucket_width).cast("long"),
                (F.col(hi_col) / bucket_width).cast("long"),
            )
        ),
    )
    exp_probe = probe.withColumn(
        "_bucket", (F.col(value_col) / bucket_width).cast("long")
    )
    return (
        exp_probe.join(exp_dim, "_bucket")
        .filter(
            (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) <= F.col(hi_col))
        )
        .drop("_bucket")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts for the same key (backward as-of).

    Union both sides tagged, sort within key by (ts, side) — right
    rows sort before left rows at equal ts so same-instant matches
    count — then carry the last non-null right values forward with
    an unbounded-preceding window. One shuffle on key; no range
    explosion; left rows with no preceding right get nulls.
    """
    lt = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    rt = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("_ts"),
            *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        )
        .withColumn("_side", F.lit(0))
    )
    lt_cols = [c for c in lt.columns if c not in ("_ts", "_side")]
    unioned = lt.unionByName(rt.select(*rt.columns), allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(c + "_asof")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).select(
        *lt_cols, *[c + "_asof" for c in value_cols]
    )
