"""SparkSession factory tuned for the engine.

Design notes (scale):
- AQE on: runtime coalescing, skew-join splitting, dynamic join
  strategy switch — at 100 TB the static plan is never right.
- Session timezone pinned to UTC: the reference's datetime policy is
  naive-UTC everywhere (reference: common/utils.py:24-36,
  common/task_queue.py:92-95), and the DuckDB oracle compares
  naive timestamps.
- Arrow enabled for every pandas interchange (Pandas UDFs,
  createDataFrame, toPandas).
- shuffle.partitions defaults to local core count for tests; a real
  cluster deployment overrides it (or relies on AQE coalescing from
  a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "nerd_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # respect the advisory partition size instead of maximizing
        # parallelism when coalescing (Spark docs' recommendation):
        # fewer, right-sized tasks at every scale
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # honor the sortBy order of bucketed tables (layout.py writes
        # one pre-sorted file per bucket; Spark self-guards — ordering
        # is only claimed when a bucket has a single file), so
        # co-partitioned joins plan with neither Exchange nor Sort
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        .config("spark.driver.memory", os.environ.get("NERD_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # InferFiltersFromGenerate turns explode(computed_array) into
        # a pre-Generate filter `size(arr)>0 AND isnotnull(arr)` whose
        # predicate inlines the ENTIRE array expression — and filter
        # pushdown then drags it below projections/exchanges,
        # re-evaluating it per row at pre-shuffle width. For this
        # engine's shingle family (k-gram transform over a regex
        # split) that re-execution measured 5-10x the whole query
        # (curation flagship 13.1s -> 7.5s when excluded). The rule
        # only pays when generators explode STORED columns, where the
        # parquet scan's own isnotnull pushdown already covers it.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def read_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one of the driver's parquet tables, normalizing types.

    The synthetic ``events`` table stores ``ts`` as parquet
    TIMESTAMP(NANOS), which Spark 4 refuses to read natively. We set
    the legacy nanos-as-long conf (runtime-settable) and rebuild a
    microsecond timestamp with ``timestamp_micros(ts div 1000)`` —
    bit-identical to what DuckDB presents for the same file (it
    truncates ns -> us on read). The raw nanos stay available as
    ``ts_ns`` for precision-sensitive ordering.
    """
    from pyspark.sql import functions as F

    # Defensive: queries may run under a caller-owned session (the
    # driver's oracle harness). The naive-UTC policy and the DuckDB
    # comparison require session TZ = UTC; both confs are
    # runtime-settable.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # No-tz parquet timestamps must land as TIMESTAMP (session-UTC),
    # not TIMESTAMP_NTZ: the whole engine (unix_micros/date math) and
    # the DuckDB naive-UTC comparison assume the classic type. The
    # inference conf is runtime-settable; the cast below is the
    # belt-and-braces path for sessions where it is not honored.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # runtime-settable mirror of the get_spark exclusion (see there):
    # without it a caller-owned session re-executes computed-array
    # expressions inside inferred pre-Generate filters
    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    )
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts_ns", F.col("ts")).withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Load the driver's parquet tables from an sf directory.

    Returns a dict name -> DataFrame. With no names, loads the full set.
    """
    all_names = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    names = names or tuple(all_names)
    return {n: read_table(spark, sf_dir, n) for n in names}
