"""The ingest pipeline: IDEA spool -> per-IP daily facts -> entity table.

Re-architecture of the reference's task/queue/worker machinery
(SURVEY §3.1): the RabbitMQ hash-routing (reference:
common/task_queue.py:203-251) becomes the groupBy shuffle; the
handler chain becomes the deterministic derivation stages
(plans/derivations.py); the Mongo record replace becomes a
partition-level merge into a date-partitioned parquet fact table.

Batch and streaming share one body: run_stream wraps run-batch logic
in foreachBatch, so replaying files through either path yields
identical tables (exactly-once via checkpointing — strictly stronger
than the reference's at-least-once acks, task_queue.py:333-338).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from nerd_spark.sources.idea import (
    explode_source_ips,
    parse_idea,
    read_idea_batch,
    read_idea_stream,
    split_corrupt,
)


def facts_from_batch(raw: DataFrame, as_of: Column | None = None) -> DataFrame:
    """IDEA batch -> per-(ip, date, node, cat) fact increments (A1).

    The groupBy here is the map-side pre-aggregation; the merge into
    the stored table re-aggregates per partition.
    """
    ok, _corrupt = split_corrupt(raw)
    per_ip = explode_source_ips(parse_idea(ok, as_of))
    return per_ip.groupBy("ip_int", "date", "node", "cats").agg(
        F.count("*").alias("n"), F.sum("conns").alias("conns")
    )


def merge_facts(spark: SparkSession, increments: DataFrame, table_path: str) -> None:
    """Additive merge into the date-partitioned fact table.

    Parquet has no MERGE; since a micro-batch only touches its events'
    days (7-day acceptance window, P10), we rewrite just the affected
    date partitions: read them, union the increments, re-aggregate,
    dynamic-partition overwrite. At scale this is bounded by
    (entities active in window) x 7 days, never the table's history.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    inc = increments.withColumn("d", F.to_date("date"))
    try:
        existing = spark.read.parquet(table_path)
        dates = [r.d for r in inc.select("d").distinct().collect()]
        if dates:
            touched = existing.filter(F.col("d").isin(dates)).select(inc.columns)
            inc = inc.unionByName(touched)
    except Exception:
        pass  # first batch: nothing to merge
    merged = inc.groupBy("ip_int", "date", "node", "cats", "d").agg(
        F.sum("n").alias("n"), F.sum("conns").alias("conns")
    )
    merged.write.mode("overwrite").partitionBy("d").parquet(table_path)


def run_batch(
    spark: SparkSession,
    spool_dir: str,
    facts_path: str,
    as_of: Column | None = None,
) -> None:
    raw = read_idea_batch(spark, spool_dir)
    merge_facts(spark, facts_from_batch(raw, as_of), facts_path)


def run_stream(
    spark: SparkSession,
    spool_dir: str,
    facts_path: str,
    checkpoint_dir: str,
    as_of: Column | None = None,
):
    """Streaming variant: same batch body under foreachBatch,
    availableNow trigger (drain the spool, then stop)."""
    raw = read_idea_stream(spark, spool_dir)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        merge_facts(spark, facts_from_batch(batch_df, as_of), facts_path)

    return (
        raw.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
