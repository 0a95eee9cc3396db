"""Export sinks (SURVEY §2.1 S10): sorted full-table feeds.

Reference equivalents: ip_rep.csv (scripts/generate_ip_rep_list.sh),
rep-threshold blocklists (generate_blocklist.sh), per-category IP
files (generate_ip_category_files.py) — all cron'd mongosh/shell
pipelines there; here each is filter -> global sort -> single-file
CSV/text write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nerd_spark.functions.ip import int2ipstr


def export_rep_list(entities: DataFrame, path: str) -> None:
    """ip,rep CSV sorted by rep desc (generate_ip_rep_list.sh:8-16)."""
    (
        entities.select(int2ipstr("ip_int").alias("ip"), F.round("rep", 6).alias("rep"))
        .orderBy(F.col("rep").desc(), "ip")
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )


def export_blocklist(entities: DataFrame, path: str, rep_threshold: float = 0.5) -> None:
    """One IP per line, rep >= threshold, numerically sorted
    (generate_blocklist.sh:20-27; whitelist exclusion = the anti
    predicate is applied by the caller via tags)."""
    (
        entities.filter(F.col("rep") >= rep_threshold)
        .orderBy("ip_int")
        .select(int2ipstr("ip_int").alias("value"))
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def export_category_files(
    daily_facts: DataFrame, base_path: str, categories: list[str]
) -> None:
    """Per-category IP lists, numerically sorted
    (generate_ip_category_files.py:55-119)."""
    for cat in categories:
        (
            daily_facts.filter(F.col("cat") == cat)
            .select("entity")
            .distinct()
            .orderBy("entity")
            .select(int2ipstr("entity").alias("value"))
            .coalesce(1)
            .write.mode("overwrite")
            .text(f"{base_path}/{cat}")
        )
