"""Streaming maintenance of the daily summary table: the PLANS.md
claim — "production ingest maintains the summary incrementally per
micro-batch" — under actual Structured Streaming.

Each micro-batch flows through sources/layout.py::update_daily_summary:
roll up the batch, merge additively with its touched date partitions,
dynamic-partition-overwrite those partitions. State is the summary
table itself (the entity-table pattern), so executor loss costs a task
retry, not a state-store rebuild, and the A-family queries read the
same table the stream writes."""

from __future__ import annotations

from pyspark.sql import DataFrame

from nerd_spark.sources.layout import update_daily_summary, update_event_summaries


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

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        update_daily_summary(spark, summary_path, batch_df, entity=entity)

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

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        update_event_summaries(spark, data_dir, batch_df, entity=entity)

    return events_stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
