"""Streaming maintenance of the daily summary table: the PLANS.md
claim — "production ingest maintains the summary incrementally per
micro-batch" — under actual Structured Streaming.

Each micro-batch flows through sources/layout.py::update_daily_summary:
roll up the batch, merge additively with its touched date partitions,
swap those partitions in through the crash-safe staged commit. State is the summary
table itself (the entity-table pattern), so executor loss costs a task
retry, not a state-store rebuild, and the A-family queries read the
same table the stream writes."""

from __future__ import annotations

from pyspark.sql import DataFrame

import os

from nerd_spark.sources.layout import update_daily_summary, update_event_summaries


def _last_applied(spark, marker_dir: str) -> int:
    """Highest epoch recorded as fully applied (Hadoop-FS listing —
    bounded by batch count)."""
    from nerd_spark.sources import fsutil

    eps = []
    for name in fsutil.list_names(spark, marker_dir):
        if name.startswith("epoch="):
            try:
                eps.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return max(eps, default=-1)


def _mark_applied(spark, marker_dir: str, epoch_id: int) -> None:
    from nerd_spark.sources import fsutil

    fsutil.touch(spark, os.path.join(marker_dir, f"epoch={epoch_id}"))


def _replay_guard(spark, marker_dir: str, apply_fn):
    """At-least-once -> effectively-once for the summary merges: a
    replayed epoch whose marker exists is SKIPPED (the merge is NOT
    idempotent — re-merging a batch double-counts it). The marker
    lands only after the full apply; the crash-mid-apply window is
    closed at FOLD granularity by the per-fold batch ledger
    (sources/layout.py::SUMMARY_LEDGER_NAME): apply_fn receives the
    epoch id as the fold batch_id, so a re-run of a half-applied
    epoch skips the folds that already committed it and re-runs only
    the torn ones. The torn-write _SUCCESS discipline still parks
    readers on the raw-scan fallback inside that window."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id <= _last_applied(spark, marker_dir):
            return
        apply_fn(batch_df, epoch_id)
        _mark_applied(spark, marker_dir, epoch_id)

    return handle


def stream_summary(
    spark,
    events_stream: DataFrame,
    summary_path: str,
    checkpoint_dir: str,
    entity: str = "user_id",
):
    """foreachBatch wiring for incremental summary maintenance.
    availableNow drains a backlog; a continuous trigger tails a live
    feed — the merge body is identical."""
    handle = _replay_guard(
        spark,
        summary_path + ".applied",
        lambda b, eid: update_daily_summary(
            spark, summary_path, b, entity=entity, batch_id=f"epoch={eid}"
        ),
    )
    return events_stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )


def stream_all_summaries(
    spark,
    events_stream: DataFrame,
    data_dir: str,
    checkpoint_dir: str,
    entity: str = "user_id",
):
    """Maintain the FULL derived-state set per micro-batch — daily
    summary, as-of anchor, and the per-entity window rollup (A2/A3/
    A6/A7's answer table, with its per-age daily vectors) — via
    sources/layout.py::update_event_summaries. This is the ingest
    loop that keeps every A-family serve path warm: after each batch
    commits, those queries are projections over current state."""

    handle = _replay_guard(
        spark,
        os.path.join(data_dir, "summaries.applied"),
        lambda b, eid: update_event_summaries(
            spark, data_dir, b, entity=entity, batch_id=f"epoch={eid}"
        ),
    )
    return events_stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
