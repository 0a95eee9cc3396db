"""Layout column-stats sidecar: probes read it, staleness guards it.

The contract under test (sources/colstats.py): a fresh sidecar's
distinct counts ROUTE the sketch probes (observable in the physical
plan — the screen path has a mapInPandas stage, the plain path does
not; the quantile bracket path ends in a driver-local relation, the
histogram path in a distributed plan), a stale or missing sidecar
falls back to the scanning probe, and routing never changes results.
Sentinel (deliberately wrong) counts are the probe-reads-the-file
oracle: only a sidecar READ can explain sentinel-driven routing.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from nerd_spark.operators import sketches as SK
from nerd_spark.sources import colstats, fsutil


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _mk_events(spark, path, n=4000):
    (
        spark.range(n)
        .select(
            (F.col("id") % 37).cast("string").alias("user_id"),
            (F.col("id") % 5).cast("string").alias("event_type"),
            (F.col("id") % 11).cast("double").alias("value"),
        )
        .repartition(2)
        .write.mode("overwrite")
        .parquet(path)
    )


def _doctor(spark, table_dir, **updates):
    """Rewrite sidecar fields in place (via fsutil so the Hadoop local
    FS checksum stays valid), keeping the pinned signature."""
    sp = colstats.stats_path(table_dir)
    payload = json.loads(fsutil.read_text(spark, sp))
    for col, nd in updates.pop("columns", {}).items():
        payload["columns"][col]["nd"] = nd
    payload["pairs"] = updates.pop("pairs", payload["pairs"])
    assert not updates
    fsutil.write_text(spark, sp, json.dumps(payload))
    colstats._CACHE.clear()


@pytest.fixture()
def stats_table(spark, tmp_path):
    path = str(tmp_path / "events.parquet")
    _mk_events(spark, path)
    colstats.write_column_stats(
        spark,
        path,
        ["user_id", "value", "event_type"],
        [("event_type", "user_id")],
    )
    return path


def test_roundtrip_and_upper_bounds(spark, stats_table):
    df = spark.read.parquet(stats_table)
    nd = colstats.distinct_upper_bound(df, ["user_id"])
    assert nd is not None and 30 <= nd <= 45  # 37 true, 5% rsd
    # direct pair stat
    pair = colstats.distinct_upper_bound(df, ["event_type", "user_id"])
    assert pair is not None and pair <= 37 * 5 * 1.3
    # no pair entry -> product of singles (still an upper bound)
    prod = colstats.distinct_upper_bound(df, ["event_type", "value"])
    assert prod is not None and prod >= 5 * 11 * 0.7
    # derived frames still resolve the leaf scan's sidecar
    # (inputFiles walks the plan) — the table-level count remains an
    # upper bound for any subset of a stored column's values
    assert (
        colstats.distinct_upper_bound(
            df.groupBy("user_id").count(), ["user_id"]
        )
        == nd
    )
    # in-memory frame (no file inputs) -> no stat
    local = spark.createDataFrame([("a",)], "user_id string")
    assert colstats.distinct_upper_bound(local, ["user_id"]) is None
    # dtype mismatch -> no stat (renamed/derived column protection)
    assert (
        colstats.distinct_upper_bound(
            df.withColumn("user_id", F.col("user_id").cast("int")),
            ["user_id"],
        )
        is None
    )


def test_sentinel_routes_top_frequent(spark, stats_table):
    df = spark.read.parquet(stats_table)
    # honest sidecar: 37 keys -> plain path, no screen stage
    plain = SK.top_frequent(df, "user_id", k=5)
    assert "mapInPandas" not in _plan(plain).lower().replace(
        "mapinpandas", "mapInPandas"
    )
    plain_rows = [tuple(r) for r in plain.collect()]
    # sentinel sidecar claims a huge domain -> screen path chosen,
    # proving the probe read the file instead of scanning
    _doctor(spark, stats_table, columns={"user_id": 50_000_000})
    screened = SK.top_frequent(df, "user_id", k=5)
    assert "mapinpandas" in _plan(screened).lower()
    assert [tuple(r) for r in screened.collect()] == plain_rows
    # conf escape: sidecar ignored, scanning probe re-routes to plain
    spark.conf.set("spark.nerd.colstatsProbe", "off")
    try:
        off = SK.top_frequent(df, "user_id", k=5)
        assert "mapinpandas" not in _plan(off).lower()
    finally:
        spark.conf.set("spark.nerd.colstatsProbe", "on")


def test_sentinel_routes_grouped_and_quantiles(spark, stats_table):
    df = spark.read.parquet(stats_table)
    hinted = SK.heavy_hitters_by(df, "event_type", "user_id", 0.002)
    assert "mapinpandas" not in _plan(hinted).lower()
    base = {tuple(r) for r in hinted.collect()}
    q = SK.exact_quantiles(df, "value", [0.5, 0.9])
    qbase = sorted(tuple(r) for r in q.collect())
    # histogram path is a distributed plan, not a driver-local result
    qplan = _plan(q).lower()
    assert "existingrdd" not in qplan and "localtablescan" not in qplan

    _doctor(
        spark,
        stats_table,
        columns={"user_id": 50_000_000, "value": 50_000_000},
        pairs=[
            {
                "cols": ["event_type", "user_id"],
                "nd": 50_000_000,
                "dtypes": ["string", "string"],
            }
        ],
    )
    screened = SK.heavy_hitters_by(df, "event_type", "user_id", 0.002)
    assert "mapinpandas" in _plan(screened).lower()
    assert {tuple(r) for r in screened.collect()} == base
    qb = SK.exact_quantiles(df, "value", [0.5, 0.9])
    qbplan = _plan(qb).lower()  # bracket path ends driver-local
    assert "existingrdd" in qbplan or "localtablescan" in qbplan
    assert sorted(tuple(r) for r in qb.collect()) == qbase


def test_stale_signature_falls_back(spark, stats_table):
    df = spark.read.parquet(stats_table)
    _doctor(spark, stats_table, columns={"user_id": 50_000_000})
    # append data AFTER the (sentinel) sidecar: signature mismatch
    # must discard it and the scanning probe routes honestly (plain)
    (
        spark.range(10)
        .select(
            F.lit("zz").alias("user_id"),
            F.lit("t").alias("event_type"),
            F.lit(1.0).alias("value"),
        )
        .write.mode("append")
        .parquet(stats_table)
    )
    colstats._CACHE.clear()
    fresh = spark.read.parquet(stats_table)
    assert colstats.distinct_upper_bound(fresh, ["user_id"]) is None
    assert "mapinpandas" not in _plan(
        SK.top_frequent(fresh, "user_id", k=5)
    ).lower()


def test_union_of_tables_borrows_no_stats(spark, stats_table, tmp_path):
    other = str(tmp_path / "other.parquet")
    _mk_events(spark, other, n=100)
    df = spark.read.parquet(stats_table).unionAll(
        spark.read.parquet(other)
    )
    assert colstats.distinct_upper_bound(df, ["user_id"]) is None


def test_amortized_refresh_growth_gate(spark, stats_table):
    df0 = spark.read.parquet(stats_table)
    # small append: signature stale, but growth < 1.25x -> NO refresh
    df0.limit(50).write.mode("append").parquet(stats_table)
    colstats._CACHE.clear()
    assert not colstats.maybe_refresh_column_stats(
        spark, stats_table, ["user_id"]
    )
    assert (
        colstats.distinct_upper_bound(
            spark.read.parquet(stats_table), ["user_id"]
        )
        is None  # stale between refreshes: probes fall back to scanning
    )
    # grow past the factor -> refresh runs and re-pins the signature
    big = spark.read.parquet(stats_table)
    big.write.mode("append").parquet(stats_table)
    colstats._CACHE.clear()
    assert colstats.maybe_refresh_column_stats(
        spark, stats_table, ["user_id"]
    )
    nd = colstats.distinct_upper_bound(
        spark.read.parquet(stats_table), ["user_id"]
    )
    assert nd is not None and 30 <= nd <= 45


def test_mtime_restore_skipped_when_data_written(spark, tmp_path, monkeypatch):
    """The sidecar write restores the table dir's mtime (the serve
    gates' staleness clock) — but ONLY when no data write landed
    since the signature capture (ADVICE r12). A data file appearing
    inside the stats window must leave the dir's mtime bump visible
    (restoring would mask it and the gates would serve stale
    summaries as fresh); the signature — which ignores hidden
    sidecars but sees any data change — is the discriminator."""
    path = str(tmp_path / "events.parquet")
    _mk_events(spark, path)

    calls = []
    real_set = fsutil.set_mtime

    def spy_set(spark_, p_, mt_):
        calls.append(p_)
        return real_set(spark_, p_, mt_)

    monkeypatch.setattr(fsutil, "set_mtime", spy_set)

    # control: clean single-writer window -> the restore runs
    colstats.write_column_stats(spark, path, ["user_id"])
    assert calls == [path]

    # inject a DATA write between the signature capture and the
    # restore: ride the sidecar's own tmp write_text
    calls.clear()
    real_write = fsutil.write_text

    def write_with_concurrent_data(spark_, p_, text_):
        if p_.endswith(".tmp"):
            (
                spark.range(5)
                .select(
                    F.col("id").cast("string").alias("user_id"),
                    F.lit("x").alias("event_type"),
                    F.lit(0.0).alias("value"),
                )
                .coalesce(1)
                .write.mode("append")
                .parquet(path)
            )
        return real_write(spark_, p_, text_)

    monkeypatch.setattr(fsutil, "write_text", write_with_concurrent_data)
    colstats.write_column_stats(spark, path, ["user_id"])
    assert calls == []  # restore skipped: the data write's bump stays
