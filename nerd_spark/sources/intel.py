"""MISP / OTX threat-intel batch parsers (SURVEY §2.1 S4).

The reference runs long-lived receiver daemons that pull MISP events
and OTX pulses over API/ZMQ and emit per-IP ``array_upsert`` tasks
into the queue (reference: NERDd/misp_receiver.py:184-312 —
create_new_event + upsert_new_event; NERDd/otx_receiver.py:114-176 —
create_new_pulse + upsert_new_pulse). Here the same parse/derive
logic is a batch transformation: a DataFrame of exported MISP events
/ OTX pulses (``spark.read.json`` with the schemas below) becomes a
changelog in the merge wire format (seq, eid, op, key, params), ready
for :func:`nerd_spark.operators.merge.merge_changelog`. Pure column
expressions — explode the attribute/indicator arrays, extract the IP,
build the op params with ``to_json``.

Scale: one explode + one projection per feed; no shuffle until the
merge groups by entity key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nerd_spark.operators.merge import stable_seq

# Parsed MISP event export (subset the receiver consumes,
# misp_receiver.py:184-215,226-243)
MISP_SCHEMA = (
    "id string, orgc string, info string, date date, timestamp long, "
    "threat_level_id string, "
    "tags array<struct<name:string, colour:string>>, "
    "attributes array<struct<id:string, type:string, value:string, "
    "deleted:boolean>>"
)

# OTX pulse export subset (otx_receiver.py:114-133)
OTX_SCHEMA = (
    "id string, name string, author_name string, created timestamp, "
    "modified timestamp, "
    "indicators array<struct<indicator:string, type:string, "
    "created:timestamp, expiration:timestamp, role:string, title:string>>"
)

_IP_TYPES = ["ip-src", "ip-dst", "ip-src|port", "ip-dst|port", "domain|ip"]

# misp_receiver.py:109
_THREAT_LEVELS = {"1": "High", "2": "Medium", "3": "Low", "4": "Undefined"}


def _misp_ip(attr_type, value):
    """IP extraction per attribute type (misp_receiver.py:227-243):
    plain for ip-src/ip-dst; split on '|' then ':' for the port forms;
    the part after '|' for domain|ip."""
    pipe = F.split(value, r"\|")
    colon = F.split(value, ":")
    return (
        F.when(attr_type.isin("ip-src", "ip-dst"), value)
        .when(
            attr_type.isin("ip-src|port", "ip-dst|port"),
            F.when(F.size(pipe) > 1, pipe[0]).otherwise(colon[0]),
        )
        .otherwise(pipe[1])  # domain|ip
    )


def parse_misp_events(events: DataFrame, misp_url: str = "misp") -> DataFrame:
    """MISP export -> one row per (ip, event) with the upsert payload.

    Columns: ip, event_id, org_created, info, role, tlp, threat_level,
    date, last_change — the new_event dict of misp_receiver.py:184-215
    (sightings/tag_list omitted: sighting notifications are a separate
    ZMQ stream; tag_list is carried as tag_names).
    """
    a = F.col("attribute")
    tags = F.coalesce("tags", F.array().cast("array<struct<name:string,colour:string>>"))
    tlp_tags = F.filter(tags, lambda t: t["name"].startswith("tlp"))
    exploded = events.select(
        "id",
        "orgc",
        "info",
        "date",
        "timestamp",
        "threat_level_id",
        F.when(F.size(tlp_tags) > 0, F.substring(tlp_tags[0]["name"], 5, 64))
        .otherwise("green")
        .alias("tlp"),
        F.transform(
            F.filter(tags, lambda t: ~t["name"].startswith("tlp")),
            lambda t: t["name"],
        ).alias("tag_names"),
        F.explode("attributes").alias("attribute"),
    ).filter(a["type"].isin(_IP_TYPES) & ~F.coalesce(a["deleted"], F.lit(False)))
    level = F.try_element_at(
        F.create_map(*[F.lit(x) for kv in _THREAT_LEVELS.items() for x in kv]),
        F.col("threat_level_id"),
    )
    return exploded.select(
        _misp_ip(a["type"], a["value"]).alias("ip"),
        F.col("id").alias("event_id"),
        F.lit(misp_url).alias("misp_instance"),
        F.col("orgc").alias("org_created"),
        "info",
        F.when(a["type"].contains("src"), "src").otherwise("dst").alias("role"),
        "tlp",
        "tag_names",
        level.alias("threat_level"),
        "date",
        F.timestamp_seconds("timestamp").alias("last_change"),
    )


def misp_changelog(
    events: DataFrame, misp_url: str = "misp", inactive_ip_lifetime: int = 180
) -> DataFrame:
    """Upsert payloads -> merge wire format (seq, eid, op, key, params):
    array_upsert misp_events keyed by (misp_instance, event_id) with
    per-field set ops, setmax _ttl.misp / last_activity
    (misp_receiver.py:286-294)."""
    p = parse_misp_events(events, misp_url)
    set_fields = [
        "org_created", "info", "role", "tlp", "threat_level",
    ]
    sets = F.array(
        *[
            F.struct(
                F.lit("set").alias("op"),
                F.lit(f_).alias("key"),
                F.struct(F.col(f_).alias("value")).alias("params"),
            )
            for f_ in set_fields
        ]
    )
    upsert_params = F.to_json(
        F.struct(
            F.struct(
                F.col("misp_instance"), F.col("event_id")
            ).alias("query"),
            F.transform(
                sets, lambda s: F.array(s["op"], s["key"], F.to_json(s["params"]))
            ).alias("ops"),
        )
    )
    live_till = F.date_add(F.col("date"), inactive_ip_lifetime)
    rows = p.select(
        F.col("ip").alias("eid"),
        F.lit("array_upsert").alias("op"),
        F.lit("misp_events").alias("key"),
        upsert_params.alias("params"),
        F.to_json(F.struct(F.col("date").cast("string").alias("value"))).alias(
            "p_act"
        ),
        F.to_json(
            F.struct(live_till.cast("string").alias("value"))
        ).alias("p_ttl"),
    )
    upserts = rows.select("eid", "op", "key", "params")
    ttls = rows.select(
        "eid", F.lit("setmax").alias("op"), F.lit("_ttl.misp").alias("key"),
        F.col("p_ttl").alias("params"),
    )
    acts = rows.select(
        "eid", F.lit("setmax").alias("op"), F.lit("last_activity").alias("key"),
        F.col("p_act").alias("params"),
    )
    out = upserts.unionByName(ttls).unionByName(acts)
    return stable_seq(out)


def parse_otx_pulses(pulses: DataFrame) -> DataFrame:
    """OTX pulse export -> one row per (ip, pulse) with the upsert
    payload (otx_receiver.py:114-133): pulse id/name/author, created/
    modified, indicator created/expiration/role/title."""
    ind = F.col("indicator")
    return (
        pulses.select(
            F.col("id").alias("pulse_id"),
            F.col("name").alias("pulse_name"),
            "author_name",
            F.col("created").alias("pulse_created"),
            F.col("modified").alias("pulse_modified"),
            F.explode("indicators").alias("indicator"),
        )
        .filter(ind["type"].isin("IPv4"))
        .select(
            ind["indicator"].alias("ip"),
            "pulse_id",
            "pulse_name",
            "author_name",
            "pulse_created",
            "pulse_modified",
            ind["created"].alias("indicator_created"),
            ind["expiration"].alias("indicator_expiration"),
            ind["role"].alias("indicator_role"),
            ind["title"].alias("indicator_title"),
        )
    )


def otx_changelog(
    pulses: DataFrame, inactive_pulse_time: int = 30
) -> DataFrame:
    """array_upsert otx_pulses keyed by pulse_id + setmax _ttl.otx
    (otx_receiver.py:136-176); live_till = (expiration | now)+N days —
    here anchored on pulse_modified for determinism."""
    p = parse_otx_pulses(pulses)
    set_fields = [
        "pulse_name", "author_name", "indicator_role", "indicator_title",
    ]
    sets = F.array(
        *[
            F.struct(
                F.lit("set").alias("op"),
                F.lit(f_).alias("key"),
                F.struct(F.col(f_).alias("value")).alias("params"),
            )
            for f_ in set_fields
        ]
    )
    upsert_params = F.to_json(
        F.struct(
            F.struct(F.col("pulse_id")).alias("query"),
            F.transform(
                sets, lambda s: F.array(s["op"], s["key"], F.to_json(s["params"]))
            ).alias("ops"),
        )
    )
    live_till = F.date_add(
        F.coalesce("indicator_expiration", "pulse_modified").cast("date"),
        inactive_pulse_time,
    )
    rows = p.select(
        F.col("ip").alias("eid"),
        F.lit("array_upsert").alias("op"),
        F.lit("otx_pulses").alias("key"),
        upsert_params.alias("params"),
        F.to_json(F.struct(live_till.cast("string").alias("value"))).alias("p_ttl"),
    )
    upserts = rows.select("eid", "op", "key", "params")
    ttls = rows.select(
        "eid", F.lit("setmax").alias("op"), F.lit("_ttl.otx").alias("key"),
        F.col("p_ttl").alias("params"),
    )
    out = upserts.unionByName(ttls)
    return stable_seq(out)


# ---------------------------------------------------------------------------
# S4 live pull seam: API pagers -> the batch parsers above. The
# reference daemons poll the MISP REST API / OTX subscribed-pulses
# endpoint (misp_receiver.py:268-312, otx_receiver.py:148-174); here
# the download is sources/feeds.py::fetch_json (stdlib urllib, paged,
# offline-testable via file:// and loopback HTTP) and everything
# after the fetch is the same DataFrame path the batch tests pin.
# ---------------------------------------------------------------------------


def _docs_to_df(spark, docs: list, schema: str) -> DataFrame:
    import json as _json

    if not docs:
        return spark.createDataFrame([], schema)
    raw = spark.createDataFrame([(_json.dumps(d),) for d in docs], "value string")
    return raw.select(F.from_json("value", schema).alias("r")).select("r.*")


def pull_misp_events(
    spark, url: str, timeout: int = 60, page_param: str | None = None
) -> DataFrame:
    """GET a MISP event export (optionally paged) -> the
    parse_misp_events input frame."""
    from nerd_spark.sources.feeds import fetch_json

    docs = fetch_json(url, timeout=timeout, page_param=page_param)
    return _docs_to_df(spark, docs, MISP_SCHEMA)


def pull_otx_pulses(
    spark, url: str, timeout: int = 60, page_param: str | None = "page"
) -> DataFrame:
    """GET the OTX subscribed-pulses pages -> the parse_otx_pulses
    input frame (pages until an empty page, the reference's loop)."""
    from nerd_spark.sources.feeds import fetch_json

    docs = fetch_json(url, timeout=timeout, page_param=page_param)
    return _docs_to_df(spark, docs, OTX_SCHEMA)
