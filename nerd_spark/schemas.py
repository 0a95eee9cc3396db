"""Explicit schemas for the engine's tables.

The reference keeps records as free-form JSON documents with implicit
schema (reference: NERDd/core/update_manager.py:97-107 auto-creates
paths; install/mongo_prepare_db.js documents the de-facto shape).
The Spark rebuild fixes the schema explicitly per SURVEY.md §1.3:
StructType for fixed shapes, MapType for dynamic-key parts (_ttl,
tags), ArrayType(StructType) for per-day buckets.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# IDEA event message (ingest input; reference: NERDd/warden_receiver.py:460-584)
# ---------------------------------------------------------------------------

_ADDRESS = T.StructType(
    [
        T.StructField("IP4", T.ArrayType(T.StringType())),
        T.StructField("IP6", T.ArrayType(T.StringType())),
        T.StructField("Proto", T.ArrayType(T.StringType())),
        T.StructField("Port", T.ArrayType(T.IntegerType())),
        T.StructField("Type", T.ArrayType(T.StringType())),
        T.StructField("Note", T.StringType()),
    ]
)

IDEA_SCHEMA = T.StructType(
    [
        T.StructField("ID", T.StringType(), False),
        T.StructField("DetectTime", T.StringType()),
        T.StructField("EventTime", T.StringType()),
        T.StructField("CeaseTime", T.StringType()),
        T.StructField("WinStartTime", T.StringType()),
        T.StructField("WinEndTime", T.StringType()),
        T.StructField("Category", T.ArrayType(T.StringType())),
        T.StructField(
            "Node",
            T.ArrayType(T.StructType([T.StructField("Name", T.StringType())])),
        ),
        T.StructField("Source", T.ArrayType(_ADDRESS)),
        T.StructField("Target", T.ArrayType(_ADDRESS)),
        T.StructField("ConnCount", T.IntegerType()),
        T.StructField("FlowCount", T.IntegerType()),
        T.StructField("Description", T.StringType()),
        T.StructField("Note", T.StringType()),
        T.StructField("_corrupt", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Entity tables (SURVEY §1.1; reference: FIXTURES.md §3-4)
# ---------------------------------------------------------------------------

EVENTS_DAILY_ELEM = T.StructType(
    [
        T.StructField("date", T.StringType()),  # ISO YYYY-MM-DD; lexical order
        T.StructField("node", T.StringType()),
        T.StructField("cat", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("conns", T.LongType()),
    ]
)

EVENTS_META = T.StructType(
    [
        T.StructField("total", T.LongType()),
        T.StructField("total1", T.LongType()),
        T.StructField("total7", T.LongType()),
        T.StructField("total30", T.LongType()),
        T.StructField("nodes_1d", T.LongType()),
        T.StructField("nodes_7d", T.LongType()),
        T.StructField("nodes_30d", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
        T.StructField("bin_ewma", T.DoubleType()),
        T.StructField("types", T.ArrayType(T.StringType())),
    ]
)

TAG_VALUE = T.StructType(
    [
        T.StructField("confidence", T.DoubleType()),
        T.StructField("info", T.StringType()),
        T.StructField("time_added", T.TimestampType()),
        T.StructField("time_modified", T.TimestampType()),
    ]
)

IP_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType(), False),  # IPv4 as uint32 in a long
        T.StructField("ts_added", T.TimestampType()),
        T.StructField("ts_last_update", T.TimestampType()),
        T.StructField("last_activity", T.TimestampType()),
        T.StructField("last_warden_event", T.TimestampType()),
        T.StructField("events", T.ArrayType(EVENTS_DAILY_ELEM)),
        T.StructField("events_meta", EVENTS_META),
        T.StructField("rep", T.DoubleType()),
        T.StructField("hostname", T.StringType()),  # stored reversed
        T.StructField(
            "geo",
            T.StructType(
                [
                    T.StructField("ctry", T.StringType()),
                    T.StructField("city", T.StringType()),
                    T.StructField("tz", T.StringType()),
                ]
            ),
        ),
        T.StructField("bgppref", T.StringType()),
        T.StructField("ipblock", T.StringType()),
        T.StructField("tags", T.MapType(T.StringType(), TAG_VALUE)),
        T.StructField("_ttl", T.MapType(T.StringType(), T.TimestampType())),
    ]
)

ASN_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("rir", T.StringType()),
        T.StructField("rep", T.DoubleType()),
        T.StructField("org", T.StringType()),
        T.StructField("bgppref", T.ArrayType(T.StringType())),
    ]
)

BGPPREF_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType(), False),
        T.StructField("rep", T.DoubleType()),
        T.StructField("asn", T.ArrayType(T.LongType())),
        T.StructField("_ref_cnt", T.LongType()),
    ]
)

IPBLOCK_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("rir", T.StringType()),
        T.StructField("descr", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("rep", T.DoubleType()),
        T.StructField("org", T.StringType()),
        T.StructField("_ref_cnt", T.LongType()),
    ]
)

ORG_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("address", T.StringType()),
        T.StructField("contact", T.StringType()),
        T.StructField("_ref_cnt", T.LongType()),
    ]
)

# Update-op changelog row (SURVEY §2.4; FIXTURES.md §7)
TASK_OPS_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("etype", T.StringType(), False),
        T.StructField("eid", T.StringType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("key", T.StringType()),
        T.StructField("params", T.StringType()),  # JSON-encoded
        T.StructField("src", T.StringType()),
    ]
)
