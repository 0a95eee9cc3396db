"""Continuous cohort-retention tracking: per-epoch day-set state
over Structured Streaming.

The batch operator (operators/funnels.py::cohort_retention) reduces
each user to (first anchor DAY, set of distinct active days) — state
that is exactly mergeable across micro-batches: day sets union and
the anchor is a running min, with no order sensitivity and no merge
error at any horizon. Each epoch therefore stores its batch's
reduction as ADDITIVE rows (u, d, kind, cnt): kind 'e' marks "user u
had an event on day d" (one row per batch-distinct pair), kind 'a'
the same for anchor-typed events. Counts sum across epochs and
replays overwrite whole epoch directories (the hh/quantile/dedup
epoch discipline: _SUCCESS-gated serving, deterministic per-batch
kernel), so existence — the only thing serving reads — is
replay-idempotent, and streaming/epochs.py::compact_epochs folds the
state under its standard single-additive-column contract (cnt).

Serving re-aggregates committed epochs per user and runs the SAME
period resolution as the batch operator, so the cumulative result
equals the one-shot batch cohort_retention over everything ingested
(test- and oracle-pinned, the streaming_quantiles discipline).

State size: epochs x per-batch distinct (user, day, kind) — bounded
by active users x days per epoch regardless of event volume, the
canonical "reduced state, not events" streaming shape; compaction
bounds the epoch union at long horizons.

Why the FUNNEL has no UNBOUNDED streaming sibling: its state is not
reducible under out-of-order arrival. A late stage-1 event can lower
t1, retroactively qualifying stage-2 events an earlier epoch already
discarded — exactness therefore requires retaining every
stage-typed event timestamp, which is "the events", not a reduction
(a bounded (t1..tk) state is exact only for streams delivered in
timestamp order, a contract the epoch replay model does not give).
Cohorts escape this because day-granularity activity is a monotone
SET — late data only ever adds elements, never invalidates one.

The engine's OWN lateness contract changes the funnel's answer,
though: P10 acceptance drops events more than 7 days behind the
high-water event time, and within that bound the pre-watermark
prefix is final — streaming/funnel_stream.py ships the
watermark-bounded EXACT funnel on that argument (frozen prefix
scalars + in-horizon event rows; see its docstring for the freeze
proof and the acceptance caveat).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from nerd_spark.streaming.hh_stream import _epochs


def process_batch(
    spark,
    batch: DataFrame,
    state_dir: str,
    anchor_type: str,
    epoch_id: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> None:
    """Absorb one arriving batch: batch-distinct (u, d, kind, cnt)
    rows into the batch's own epoch directory."""
    if epoch_id is None:
        known = _epochs(spark, state_dir)
        epoch_id = (known[-1] + 1) if known else 0
    e = batch.select(
        F.col(user_col).alias("u"),
        F.to_date(ts_col).alias("d"),
        F.col(type_col).alias("et"),
    ).filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
    pairs = (
        e.select("u", "d", F.lit("e").alias("kind"))
        .unionByName(
            e.filter(F.col("et") == anchor_type).select(
                "u", "d", F.lit("a").alias("kind")
            )
        )
        .groupBy("u", "d", "kind")
        .agg(F.count("*").alias("cnt"))
    )
    pairs.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"epoch={epoch_id}")
    )


def current_retention(
    spark,
    state_dir: str,
    period_days: int = 7,
    n_periods: int = 4,
) -> DataFrame:
    """Cohort retention over everything ingested so far — the same
    (cohort_date, period, cohort_size, active_users, retention)
    contract as the batch operator. Empty state returns the empty
    frame in that schema (user ids do not appear in the output, so
    the schema is source-type independent)."""
    from nerd_spark.operators.funnels import retention_from_per_user

    eps = _epochs(spark, state_dir)
    if not eps:
        return spark.createDataFrame(
            [],
            "cohort_date string, period long, cohort_size long, "
            "active_users long, retention double",
        )
    paths = [os.path.join(state_dir, f"epoch={e}") for e in eps]
    pairs = (
        spark.read.option("basePath", state_dir).parquet(*paths).drop("epoch")
    )
    per_u = (
        pairs.groupBy("u")
        .agg(
            F.min(F.when(F.col("kind") == "a", F.col("d"))).alias("d0"),
            F.collect_set(
                F.when(F.col("kind") == "e", F.col("d"))
            ).alias("days"),
        )
        .filter(F.col("d0").isNotNull())
    )
    return retention_from_per_user(per_u, period_days, n_periods)


def stream_retention(
    spark,
    events_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    anchor_type: str = "signup",
    compact_after: int | None = 16,
):
    """Wire :func:`process_batch` as a foreachBatch sink with the
    automatic base-epoch roll-up past ``compact_after`` committed
    epochs (keep_recent=2 covers the at-least-once replay window;
    ``None`` disables)."""
    from nerd_spark.streaming.epochs import maybe_compact

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        process_batch(
            spark, batch_df, state_dir,
            anchor_type=anchor_type, epoch_id=epoch_id,
        )
        if compact_after is not None:
            maybe_compact(spark, state_dir, "cnt", max_epochs=compact_after)

    return (
        events_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
