"""The composed derivation pipeline: daily facts -> full entity
snapshot (SURVEY §3.1 stage 8).

The reference's chain reaction — EventCounter -> EventTypeCounter ->
Reputation -> rep_total -> Tags -> TTL (reference:
NERDd/core/update_manager.py:617-731, fixpoint loop with
postponement) — has a *static* topological order, so it composes here
as a fixed sequence of dataset-level joins. One output row per
entity, shaped like the reference's ip record (FIXTURES.md §3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nerd_spark.plans import derivations as D
from nerd_spark.plans.tags_dsl import tag_table


def build_entity_snapshot(
    daily: DataFrame,
    as_of: DataFrame,
    tags_cfg: dict[str, dict] | None = None,
    ttl_days: int = 14,
) -> DataFrame:
    """daily: the (entity, d, cat, n, ...) fact table (A1 output).
    as_of: single-row frame with timestamp col ``as_of``.

    Output columns: entity, events_meta struct (total/total1/total7/
    total30/cats_7d/ewma/bin_ewma/types), rep, last_activity,
    _ttl map, tags map.
    """
    dwa = D.with_as_of(daily, as_of)

    totals = D.window_totals(dwa, windows=(1, 7, 30))
    ew = D.ewma(dwa)
    prof = (
        D.type_profile(dwa)
        .groupBy("entity")
        .agg(F.sort_array(F.collect_list("cat")).alias("types"))
    )
    rep = D.source_reputation(dwa, out="rep")
    last_act = dwa.groupBy("entity").agg(
        F.max(F.to_date("d")).alias("last_day"), F.first("as_of").alias("as_of")
    )

    snap = (
        totals.join(ew, "entity", "left")
        .join(prof, "entity", "left")
        .join(rep, "entity", "left")
        .join(last_act, "entity", "left")
    )
    snap = snap.select(
        "entity",
        F.struct(
            "total", "total1", "total7", "total30", "cats_7d",
            "ewma", "bin_ewma",
            F.coalesce("types", F.array().cast("array<string>")).alias("types"),
        ).alias("events_meta"),
        F.coalesce("rep", F.lit(0.0)).alias("rep"),
        F.col("last_day").alias("last_activity"),
        # per-source TTL token: live until last activity + ttl_days
        # (reference: warden TTL setmax, warden_receiver.py:541,561)
        F.create_map(
            F.lit("warden"),
            F.to_timestamp(F.date_add("last_day", ttl_days)),
        ).alias("_ttl"),
        "total", "total7", "ewma",  # flat copies for the tags profile
    )

    if tags_cfg:
        tags = (
            tag_table(snap, tags_cfg)
            .groupBy("entity")
            .agg(
                F.map_from_entries(
                    F.sort_array(
                        F.collect_list(F.struct("tag", F.struct("confidence", "info")))
                    )
                ).alias("tags")
            )
        )
        snap = snap.join(tags, "entity", "left")
    return snap.drop("total", "total7", "ewma")


def snapshot_as_of(events: DataFrame, entity: str = "user_id", **kw) -> DataFrame:
    """Convenience: events -> facts -> snapshot with as_of = max ts."""
    as_of = events.agg(F.max("ts").alias("as_of"))
    return build_entity_snapshot(D.daily_rollup(events, entity), as_of, **kw)
