#!/usr/bin/env python
"""End-to-end demo of the engine's NERD lifecycle on synthetic data:

  1. write a spool of IDEA alert files (incl. a corrupt one)
  2. streaming ingest -> date-partitioned per-IP daily fact table
  3. derivation pipeline -> entity snapshot (counters, EWMA,
     reputation, types, TTL, tags)
  4. query surface: subnet + category filter, top-k by reputation
  5. exports: rep list CSV + blocklist

Run: PYTHONPATH=. python examples/end_to_end.py
"""

from __future__ import annotations

import json
import random
import tempfile
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from nerd_spark.plans.filters import EntityQuery, search
from nerd_spark.plans.pipeline import build_entity_snapshot
from nerd_spark.session import get_spark
from nerd_spark.sources.exports import export_blocklist, export_rep_list
from nerd_spark.streaming.ingest import run_stream

AS_OF = datetime(2024, 3, 10, 12, 0, 0)


def write_spool(path: str, n: int = 300) -> None:
    rng = random.Random(42)
    cats = ["Recon.Scanning", "Attempt.Login", "Abusive.Spam"]
    nodes = ["cz.nodeA", "cz.nodeB", "de.nodeC"]
    for i in range(n):
        dt = AS_OF - timedelta(hours=rng.randrange(0, 7 * 24))
        ip = f"10.0.{rng.randrange(4)}.{rng.randrange(40)}"
        msg = {
            "ID": f"evt{i}",
            "DetectTime": dt.strftime("%Y-%m-%dT%H:%M:%SZ"),
            "Category": [rng.choice(cats)],
            "Node": [{"Name": rng.choice(nodes)}],
            "Source": [{"IP4": [ip]}],
            "ConnCount": rng.randrange(1, 20),
        }
        with open(f"{path}/msg{i}.json", "w") as f:
            f.write(json.dumps(msg))
    with open(f"{path}/broken.json", "w") as f:
        f.write("{this is not json")


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="nerd_spark_demo_")
    spool, facts, ckpt = f"{tmp}/spool", f"{tmp}/facts", f"{tmp}/ckpt"
    import os

    os.makedirs(spool)
    write_spool(spool)
    spark = get_spark(app_name="nerd_spark_demo")
    as_of_lit = F.to_timestamp(F.lit(AS_OF.strftime("%Y-%m-%d %H:%M:%S")))

    print("== 1-2. streaming ingest of the IDEA spool")
    q = run_stream(spark, spool, facts, ckpt, as_of=as_of_lit)
    q.awaitTermination(300)
    daily = spark.read.parquet(facts)
    print(f"   fact rows: {daily.count()} over {daily.select('d').distinct().count()} days")

    print("== 3. derivation pipeline -> entity snapshot")
    facts_norm = daily.select(
        F.col("ip_int").alias("entity"),
        F.to_date("date").alias("d"),
        F.col("cats").alias("cat"),
        "n",
    )
    as_of_df = spark.createDataFrame(
        [(AS_OF.strftime("%Y-%m-%d %H:%M:%S"),)], "as_of string"
    ).select(F.to_timestamp("as_of").alias("as_of"))
    tags_cfg = {
        "active": {"condition": "total7 >= 5", "confidence": "ewma / 10"},
        "scanner": {"condition": "'ReconScanning' in events_meta.types"},
    }
    snap = build_entity_snapshot(facts_norm, as_of_df, tags_cfg=tags_cfg).cache()
    snap.select("entity", "events_meta.total", "events_meta.ewma", "rep").show(5)

    print("== 4. query surface: 10.0.0.0/24 scanners by reputation")
    # raw per-entity category set (events_meta.types is the share-
    # thresholded profile, mostly empty for low-volume entities)
    cats = facts_norm.groupBy("entity").agg(
        F.sort_array(F.collect_set("cat")).alias("cats")
    )
    profile = snap.join(cats, "entity").select(
        "entity", F.col("entity").alias("ip_int"), "rep", "cats"
    )
    spec = EntityQuery(subnet="10.0.0.0/24", cats_any=["ReconScanning"])
    search(profile, spec, sort_by="rep", limit=5).show()

    print("== 5. exports")
    export_rep_list(snap.select(F.col("entity").alias("ip_int"), "rep"), f"{tmp}/rep")
    export_blocklist(
        snap.select(F.col("entity").alias("ip_int"), "rep"), f"{tmp}/bl", 0.4
    )
    print(f"   wrote {tmp}/rep and {tmp}/bl")

    print("== 6. typed ip-record pipeline (round 2): full IP_SCHEMA records")
    from nerd_spark.plans.ip_record import build_ip_records
    from nerd_spark.sources.idea import (
        explode_source_ips,
        parse_idea,
        read_idea_batch,
    )

    exploded = explode_source_ips(
        parse_idea(read_idea_batch(spark, spool), as_of=as_of_lit)
    )
    recs = build_ip_records(exploded, as_of_df, profile_min_total=1)
    recs.select(
        "_id", "events_meta.total", "events_meta.types", "rep", "_ttl"
    ).show(3, truncate=False)

    print("== 7. threat-intel feeds -> document merge (round 2)")
    import json as _json

    from nerd_spark.operators.merge import merge_changelog
    from nerd_spark.sources.feeds import blacklist_changelog, parse_blacklist

    bl_lines = spark.createDataFrame(
        [("10.0.0.5",), ("10.0.0.9",), ("# comment",)], "value string"
    )
    ch = blacklist_changelog(
        parse_blacklist(bl_lines, "demo-bl"), "demo-bl", AS_OF.strftime("%Y-%m-%d %H:%M:%S")
    )
    empty = spark.createDataFrame([], "eid string, record string")
    merged = merge_changelog(empty, ch)
    for r in merged.limit(2).collect():
        print("  ", r.eid, _json.loads(r.record)["bl"])
    spark.stop()
    print("DEMO OK")


if __name__ == "__main__":
    main()
