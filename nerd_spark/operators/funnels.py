"""Ordered-funnel and cohort-retention analytics over event streams.

The reference's event model (per-entity event arrays with dates and
categories — common/eventdb_psql.py stores per-IP event rows;
NERDd/core keeps per-entity daily buckets) supports exactly the
questions a security/product analyst asks of 100 TB of telemetry:
"how many entities progressed view -> click -> purchase, in order?"
and "of the entities first seen in week W, how many were active k
weeks later?". Neither is a plain groupBy — both need ORDER among a
user's events — but neither needs a per-user sort either:

- funnel: stage times reduce to per-user scalars
  t_i = min(ts of stage i with ts >= t_{i-1}) — VALUE semantics, not
  row-adjacency, so each stage is one filtered map-side-combined
  min-aggregation plus an equi-join on the user key against the
  previous stage's scalar frame. len(stages) shuffles of one row per
  qualifying user; the event table is scanned once per stage with
  the stage filter pushed to the scan. No window, no sort.
- cohort retention: the cohort anchor is one min-aggregation; period
  membership is integer arithmetic on microsecond epochs (exact in
  any engine), and the per-(cohort, period) active count is one
  distinct-aggregation. Two shuffles total.

Value semantics make both oracle-exact: every derived quantity is a
min/count over values, independent of row order and partitioning.

At 100 TB: funnels and cohorts are the canonical "big fact table,
tiny result" aggregations — every stage frame after the first
aggregation is one row per user, and AQE broadcasts the smaller side
of each stage join when the funnel narrows (it always narrows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_US_PER_DAY = 86_400 * 1_000_000


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion: stage i counts users whose earliest
    qualifying stage-i event is at or after their earliest qualifying
    stage-(i-1) event.

    Returns (stage_idx int, stage string, users long, rate double) —
    rate = round(users / stage-1 users, 6); one row per stage, stage-1
    rate is 1.0 (or the frame is the 0-user degenerate row set when
    nobody reaches stage 1).
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    spark = events.sparkSession
    e = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("et"),
    ).filter(F.col("ts").isNotNull())
    prev = None
    counts = []  # per-stage one-row frames (lazy)
    for i, st in enumerate(stages):
        cur = e.filter(F.col("et") == st)
        if prev is None:
            reached = cur.groupBy("u").agg(F.min("ts").alias("t"))
        else:
            # equi-join on the user key against the previous stage's
            # one-row-per-user scalar frame; AQE sizes the join
            reached = (
                cur.join(prev.select("u", F.col("t").alias("_pt")), "u")
                .filter(F.col("ts") >= F.col("_pt"))
                .groupBy("u")
                .agg(F.min("ts").alias("t"))
            )
        counts.append(
            reached.agg(F.count("*").alias("users")).select(
                F.lit(i + 1).alias("stage_idx"),
                F.lit(st).alias("stage"),
                "users",
            )
        )
        prev = reached
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    base = counts[0].select(F.col("users").alias("_base"))
    return out.crossJoin(F.broadcast(base)).select(
        "stage_idx",
        "stage",
        "users",
        F.when(F.col("_base") > 0, F.round(F.col("users") / F.col("_base"), 6))
        .otherwise(F.lit(None).cast("double"))
        .alias("rate"),
    )


def cohort_retention(
    events: DataFrame,
    anchor_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    period_days: int = 7,
    n_periods: int = 4,
) -> DataFrame:
    """Cohort retention: users anchored by their FIRST ``anchor_type``
    event, grouped into cohorts by that anchor's calendar date, and
    counted active in period k when any later event lands in
    [anchor + k*period, anchor + (k+1)*period) — period 0 is the
    anchor period itself.

    Returns (cohort_date string yyyy-MM-dd, period int, cohort_size
    long, active_users long, retention double). Periods 0..n_periods-1
    appear only when at least one cohort user is active in them (no
    dense zero-fill — at scale the dense frame is cohorts x periods
    of mostly-zero rows; the oracle mirrors the sparse contract).

    Period membership is integer arithmetic on microsecond epochs —
    exact and engine-independent, no calendar truncation parity risk.
    """
    e = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("et"),
    ).filter(F.col("ts").isNotNull())
    anchors = (
        e.filter(F.col("et") == anchor_type)
        .groupBy("u")
        .agg(F.min("ts").alias("t0"))
        .select(
            "u",
            "t0",
            F.date_format("t0", "yyyy-MM-dd").alias("cohort_date"),
        )
    )
    sizes = anchors.groupBy("cohort_date").agg(
        F.count("*").alias("cohort_size")
    )
    # integer (div) division on exact microsecond longs: double
    # division could round a just-under-boundary quotient onto the
    # boundary and flip a row's period; the oracle's // is integer
    # floor division, so the engine must match it exactly
    period = F.expr(
        f"(unix_micros(ts) - unix_micros(t0)) div {period_days * _US_PER_DAY}"
    )
    active = (
        e.join(anchors, "u")
        .filter(F.col("ts") >= F.col("t0"))
        .select("u", "cohort_date", period.alias("period"))
        .filter(F.col("period") < n_periods)
        .groupBy("cohort_date", "period")
        .agg(F.count_distinct("u").alias("active_users"))
    )
    return active.join(sizes, "cohort_date").select(
        "cohort_date",
        "period",
        "cohort_size",
        "active_users",
        F.round(F.col("active_users") / F.col("cohort_size"), 6).alias(
            "retention"
        ),
    )
