"""Event archive (EventDB): the relational store of raw events.

Replaces the PSQL events + exploded events_sources/events_targets
tables (reference: install/create_warden_db.sql:2-36; writer
common/eventdb_psql.py:87-212; per-IP fetch :50-82). Spark shape:
date-partitioned parquet for the main table — partition pruning
replaces the detecttime index; the exploded per-IP view replaces the
link tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def archive_events(parsed: DataFrame, path: str) -> None:
    """S7: append the normalized event batch, partitioned by day.

    At 100 TB the daily partitions keep per-IP fetches and retention
    drops (cleaner §2.8) to partition-pruned scans instead of
    full-table passes.
    """
    parsed.withColumn("d", F.to_date("detect_ts")).write.mode("append").partitionBy(
        "d"
    ).parquet(path)


def read_archive(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def exploded_sources(archive: DataFrame) -> DataFrame:
    """events_sources equivalent: (ip, event id, detect_ts)."""
    return archive.select(
        "id", "detect_ts", F.explode("Source").alias("src")
    ).select("id", "detect_ts", F.explode("src.IP4").alias("ip"))


def fetch_events_for_ip(
    archive: DataFrame, ip: str, dt_from=None, limit: int = 100
) -> DataFrame:
    """S8: events where ip ∈ sources, newest first, LIMIT
    (reference: eventdb_psql.py:50-82 — the SQL join at :69-72).
    The exploded side filters first, so the join input is tiny."""
    src = exploded_sources(archive).filter(F.col("ip") == ip)
    if dt_from is not None:
        src = src.filter(F.col("detect_ts") >= dt_from)
    ids = src.select("id").distinct()
    return (
        archive.join(F.broadcast(ids), "id")
        .orderBy(F.col("detect_ts").desc(), F.col("id").desc())
        .limit(limit)
    )
