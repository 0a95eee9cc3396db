"""End-to-end typed ip-record pipeline (SURVEY §3.1).

The reference's write path folds every IDEA alert into a free-form
JSON document per IP: ``array_upsert events {date,node,cat} (n+=1,
conns+=c)``, running-total / last-activity / TTL stamps, then the
handler DAG derives events_meta, reputation, type profile
(reference: NERDd/warden_receiver.py:551-578 task build;
update_manager.py:585-748 apply + chain reaction).

Here the same record materializes as ONE dataset-level plan over the
exploded event rows, producing rows of the *typed* ``IP_SCHEMA``
(nerd_spark/schemas.py): nested ``events[]`` array, ``events_meta``
struct, ``_ttl`` map — not JSON strings. The fold-vs-columnar
equivalence against the §2.4 document merge is property-tested.

Plan shape: one groupBy(_id, date, node, cat) fact rollup (the A1
shuffle), then per-entity aggregations reusing that exchange; the
type profile and per-day reputation are small derived aggs joined
back on _id. At 100 TB the record table is bounded by live-IP
cardinality, not event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nerd_spark.plans import reputation as R

EWMA_A, EWMA_D = 0.25, 0.75  # event_counter.py:12-13


def ip_daily_rollup(exploded: DataFrame) -> DataFrame:
    """A1: per-(ip, date, node, cat) fact rollup from the exploded
    per-(event, Source.IP4) rows (warden_receiver.py:534-563)."""
    return exploded.groupBy(
        F.col("ip_int").alias("_id"),
        "date",
        "node",
        F.col("cats").alias("cat"),
    ).agg(
        F.count("*").alias("n"),
        F.sum("conns").cast("long").alias("conns"),
        F.max("end_ts").alias("_max_end"),
        F.min("detect_ts").alias("_min_detect"),
    )


def build_ip_records(
    exploded: DataFrame,
    as_of: DataFrame,
    ttl_days: int = 14,
    profile_min_share: float = 0.05,
    profile_min_total: int = 10,
) -> DataFrame:
    """exploded (id,node,cats,detect_ts,end_ts,conns,date,ip,ip_int)
    + broadcast as_of frame -> typed IP_SCHEMA-shaped record table.

    Derivations per the handler DAG, flattened to fixed stages
    (SURVEY §3.1 stage 8): events[] buckets, events_meta windows +
    EWMA + type profile, warden reputation (reputation.yml params),
    last_activity / last_warden_event / _ttl.warden (+14 d,
    etc/nerd.yml:7), ts_added/ts_last_update lifecycle stamps.
    Enrichment fields (hostname/geo/bgppref/ipblock) stay NULL here —
    they belong to the whois/entity-graph stage (plans/entity_graph).
    """
    daily = ip_daily_rollup(exploded).crossJoin(F.broadcast(as_of))
    d = F.to_date("date")
    age = F.datediff(F.to_date("as_of"), d)
    w = F.lit(EWMA_A) * F.pow(F.lit(EWMA_D), age.cast("double"))

    rec = daily.groupBy("_id").agg(
        F.sort_array(
            F.collect_list(F.struct("date", "node", "cat", "n", "conns"))
        ).alias("events"),
        F.sum("n").alias("total"),
        F.sum(F.when(age <= 1, F.col("n")).otherwise(0)).alias("total1"),
        F.sum(F.when(age <= 7, F.col("n")).otherwise(0)).alias("total7"),
        F.sum(F.when(age <= 30, F.col("n")).otherwise(0)).alias("total30"),
        F.count_distinct(F.when(age <= 1, F.col("node"))).alias("nodes_1d"),
        F.count_distinct(F.when(age <= 7, F.col("node"))).alias("nodes_7d"),
        F.count_distinct(F.when(age <= 30, F.col("node"))).alias("nodes_30d"),
        F.round(
            F.coalesce(F.sum(F.when(age < 7, F.col("n") * w)), F.lit(0.0)), 6
        ).alias("ewma"),
        F.collect_set(F.when(age < 7, d)).alias("_days7"),
        F.max("_max_end").alias("last_warden_event"),
        F.min("_min_detect").alias("ts_added"),
        F.first("as_of").alias("as_of"),
    )
    day_w = lambda x: F.lit(EWMA_A) * F.pow(  # noqa: E731
        F.lit(EWMA_D), F.datediff(F.to_date("as_of"), x).cast("double")
    )
    rec = rec.withColumn(
        "bin_ewma",
        F.round(F.aggregate("_days7", F.lit(0.0), lambda a, x: a + day_w(x)), 6),
    )

    # A5 type profile -> events_meta.types (event_type_counter.py:41-104)
    per_cat = daily.groupBy("_id", "cat").agg(F.sum("n").alias("n_cat"))
    per_ent = daily.groupBy("_id").agg(F.sum("n").alias("n_tot"))
    types = (
        per_cat.join(per_ent, "_id")
        .filter(
            (F.col("n_tot") >= profile_min_total)
            & (F.col("n_cat") / F.col("n_tot") >= profile_min_share)
        )
        .groupBy("_id")
        .agg(F.sort_array(F.collect_list("cat")).alias("types"))
    )

    # warden reputation with the reputation.yml params (scale 10/2,
    # 14 d linear; detectors = distinct nodes per day)
    per_day = daily.groupBy(F.col("_id").alias("entity"), d.alias("d")).agg(
        F.sum("n").alias("num_events"),
        F.count_distinct("node").alias("num_detectors"),
    )
    rep = R.partial_reputation(
        per_day, as_of, R.DEFAULT_REP_CONFIG["warden"], out="rep"
    ).withColumnRenamed("entity", "_id")

    out = (
        rec.join(types, "_id", "left")
        .join(rep, "_id", "left")
        .select(
            "_id",
            "ts_added",
            F.col("as_of").alias("ts_last_update"),
            F.col("last_warden_event").alias("last_activity"),
            "last_warden_event",
            "events",
            F.struct(
                "total", "total1", "total7", "total30",
                "nodes_1d", "nodes_7d", "nodes_30d",
                "ewma", "bin_ewma",
                F.coalesce("types", F.array().cast("array<string>")).alias(
                    "types"
                ),
            ).alias("events_meta"),
            F.coalesce("rep", F.lit(0.0)).alias("rep"),
            F.lit(None).cast("string").alias("hostname"),
            F.lit(None)
            .cast("struct<ctry:string,city:string,tz:string>")
            .alias("geo"),
            F.lit(None).cast("string").alias("bgppref"),
            F.lit(None).cast("string").alias("ipblock"),
            F.lit(None)
            .cast(
                "map<string,struct<confidence:double,info:string,"
                "time_added:timestamp,time_modified:timestamp>>"
            )
            .alias("tags"),
            F.create_map(
                F.lit("warden"),
                (F.col("last_warden_event") + F.expr(f"INTERVAL {ttl_days} DAYS")),
            ).alias("_ttl"),
        )
    )
    return out


def refresh_ip_records(
    exploded: DataFrame,
    changed_keys: DataFrame,
    existing_records: DataFrame,
    as_of: DataFrame,
    **build_kwargs,
) -> DataFrame:
    """O(changed-keys) maintenance of the typed record table: rebuild
    records only for entities in `changed_keys` (one ip_int column)
    from their full event history; untouched records pass through
    JVM-side via an anti-join (same shape as merge_changelog's
    incremental path — valid because every derived field of a record
    depends only on that entity's own events + as_of; locality is
    asserted by test_ip_record_locality).

    Note the recompute is exact, not a delta: the reference's daily
    tick also recomputes age-dependent fields wholesale per entity
    (NERDd/updater.py:56-142); here the per-entity cost is one pass
    over that entity's facts, and with the events table bucketed by
    entity the semi-join prunes buckets instead of scanning.
    """
    touched = exploded.join(changed_keys, "ip_int", "left_semi")
    rebuilt = build_ip_records(touched, as_of, **build_kwargs)
    kept = existing_records.join(
        changed_keys.withColumnRenamed("ip_int", "_id"), "_id", "left_anti"
    )
    return kept.unionByName(rebuilt)
