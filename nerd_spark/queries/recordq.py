"""§3.1 end-to-end typed ip-record query: the whole write path —
fact rollup → events[] buckets → events_meta windows/EWMA/profile →
warden reputation → TTL — materialized at the typed IP_SCHEMA and
hash-checked against a DuckDB mirror. Nested events[]/types are
flattened to deterministic strings for the value hash; the underlying
pipeline (plans/ip_record.py) returns the real nested rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nerd_spark.ml.fmp import IP_BASE, IP_STRIDE
from nerd_spark.plans.ip_record import build_ip_records
from nerd_spark.plans.reputation import nonlin_capped_sql as _NL
from nerd_spark.queries.base import query, t

_DEN_14 = sum((14 - a) / 14 for a in range(14))


def _exploded_from_events(spark, sf_dir):
    """Deterministic IDEA-replay shape from the synthetic events
    table: ip = IP_BASE + user_id*97, node = 'N'+(event_id%3),
    cat = event_type, conns = floor(value)."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").cast("string").alias("id"),
        F.concat(F.lit("N"), (F.col("event_id") % 3).cast("string")).alias("node"),
        F.col("event_type").alias("cats"),
        F.col("ts").alias("detect_ts"),
        F.col("ts").alias("end_ts"),
        F.floor("value").alias("conns"),
        F.date_format("ts", "yyyy-MM-dd").alias("date"),
        (F.lit(IP_BASE) + F.col("user_id") * IP_STRIDE).alias("ip_int"),
    )


# Shared DuckDB mirror of build_ip_records (used by ip_records and
# read_path_typed): fact rollup -> record aggregates -> type profile ->
# warden reputation, all keyed by the synthetic ip embedding.
_IPREC_CTES = f"""
    WITH src AS (
      SELECT user_id, ts, event_type, event_id,
             CAST(floor(value) AS BIGINT) AS conns
      FROM events
    ),
    anchor AS (SELECT max(ts) AS ao, CAST(max(ts) AS DATE) AS ad FROM src),
    ex AS (
      SELECT 167772160 + user_id * 97 AS id,
             strftime(ts, '%Y-%m-%d') AS date,
             'N' || (event_id % 3)::VARCHAR AS node,
             event_type AS cat, ts, conns
      FROM src
    ),
    daily AS (
      SELECT id, date, node, cat, count(*) AS n,
             CAST(sum(conns) AS BIGINT) AS c,
             max(ts) AS maxts, min(ts) AS mints
      FROM ex GROUP BY 1, 2, 3, 4
    ),
    rec AS (
      SELECT id,
        CAST(sum(n) AS BIGINT) AS total,
        CAST(sum(CASE WHEN date_diff('day', CAST(date AS DATE), ad) <= 1 THEN n ELSE 0 END) AS BIGINT) AS total1,
        CAST(sum(CASE WHEN date_diff('day', CAST(date AS DATE), ad) <= 7 THEN n ELSE 0 END) AS BIGINT) AS total7,
        CAST(sum(CASE WHEN date_diff('day', CAST(date AS DATE), ad) <= 30 THEN n ELSE 0 END) AS BIGINT) AS total30,
        CAST(count(DISTINCT node) FILTER (WHERE date_diff('day', CAST(date AS DATE), ad) <= 1) AS BIGINT) AS nodes_1d,
        CAST(count(DISTINCT node) FILTER (WHERE date_diff('day', CAST(date AS DATE), ad) <= 7) AS BIGINT) AS nodes_7d,
        CAST(count(DISTINCT node) FILTER (WHERE date_diff('day', CAST(date AS DATE), ad) <= 30) AS BIGINT) AS nodes_30d,
        round(coalesce(sum(n * 0.25 * pow(0.75, date_diff('day', CAST(date AS DATE), ad)))
              FILTER (WHERE date_diff('day', CAST(date AS DATE), ad) < 7), 0), 6) AS ewma,
        max(maxts) AS last_warden_event,
        min(mints) AS ts_added
      FROM daily, anchor GROUP BY 1
    ),
    -- separate CTE: count(DISTINCT..) FILTER and list(struct) in the
    -- same aggregate trip a DuckDB internal error (shared_ptr NULL)
    -- in duckdb 1.0.0; pinned by tests/test_duckdb_pin.py, which
    -- proves value-equivalence if a future engine fixes the bug
    evs AS (
      SELECT id, array_to_string(list_transform(
        list_sort(list({{'date': date, 'node': node, 'cat': cat,
                         'n': n, 'conns': c}})),
        s -> s['date'] || ':' || s['node'] || ':' || s['cat'] || ':'
             || s['n']::VARCHAR || ':' || s['conns']::VARCHAR), '|') AS events_str
      FROM daily GROUP BY 1
    ),
    pd AS (SELECT id, date FROM daily GROUP BY 1, 2),
    bins AS (
      SELECT id, round(coalesce(sum(0.25 * pow(0.75, date_diff('day', CAST(date AS DATE), ad)))
             FILTER (WHERE date_diff('day', CAST(date AS DATE), ad) < 7), 0), 6) AS bin_ewma
      FROM pd, anchor GROUP BY 1
    ),
    per_cat AS (SELECT id, cat, sum(n) AS n_cat FROM daily GROUP BY 1, 2),
    per_ent AS (SELECT id, sum(n) AS n_tot FROM daily GROUP BY 1),
    types AS (
      SELECT c.id, array_to_string(list_sort(list(c.cat)), ',') AS types_str
      FROM per_cat c JOIN per_ent e USING (id)
      WHERE e.n_tot >= 10 AND c.n_cat * 1.0 / e.n_tot >= 0.05
      GROUP BY 1
    ),
    repd AS (
      SELECT id, date, sum(n) AS nd, count(DISTINCT node) AS ndet
      FROM daily GROUP BY 1, 2
    ),
    rep AS (
      SELECT id,
        round(sum({_NL("nd", 10)} * {_NL("ndet", 2)}
              * (14 - date_diff('day', CAST(date AS DATE), ad)) / 14.0)
              / {_DEN_14}, 6) AS rep
      FROM repd, anchor
      WHERE date_diff('day', CAST(date AS DATE), ad) < 14 GROUP BY 1
    )"""


@query(
    "ip_records",
    f"""{_IPREC_CTES}
    SELECT r.id AS _id, v.events_str,
           r.total, r.total1, r.total7, r.total30,
           r.nodes_1d, r.nodes_7d, r.nodes_30d,
           r.ewma, b.bin_ewma,
           coalesce(t.types_str, '') AS types_str,
           coalesce(p.rep, 0.0) AS rep,
           strftime(r.last_warden_event, '%Y-%m-%d %H:%M:%S') AS last_activity,
           strftime(r.ts_added, '%Y-%m-%d %H:%M:%S') AS ts_added,
           strftime(r.last_warden_event + INTERVAL 14 DAYS,
                    '%Y-%m-%d %H:%M:%S') AS ttl_warden
    FROM rec r
    JOIN evs v ON v.id = r.id
    JOIN bins b ON b.id = r.id
    LEFT JOIN types t ON t.id = r.id
    LEFT JOIN rep p ON p.id = r.id
    """,
)
def ip_records(spark, sf_dir):
    # (reference trace SURVEY §3.1: warden_receiver.py:551-578 task
    # build + update_manager.py:585-748 handler DAG — here one
    # dataset-level plan producing the typed IP_SCHEMA record table;
    # nested columns flattened to strings only for the value hash)
    ex = _exploded_from_events(spark, sf_dir)
    as_of = ex.agg(F.max("detect_ts").alias("as_of"))
    recs = build_ip_records(ex, as_of)
    ev_str = F.array_join(
        F.transform(
            "events",
            lambda e: F.concat_ws(
                ":", e["date"], e["node"], e["cat"], e["n"], e["conns"]
            ),
        ),
        "|",
    )
    m = F.col("events_meta")
    return recs.select(
        "_id",
        ev_str.alias("events_str"),
        m["total"].alias("total"),
        m["total1"].alias("total1"),
        m["total7"].alias("total7"),
        m["total30"].alias("total30"),
        m["nodes_1d"].alias("nodes_1d"),
        m["nodes_7d"].alias("nodes_7d"),
        m["nodes_30d"].alias("nodes_30d"),
        m["ewma"].alias("ewma"),
        m["bin_ewma"].alias("bin_ewma"),
        F.array_join(m["types"], ",").alias("types_str"),
        "rep",
        F.date_format("last_activity", "yyyy-MM-dd HH:mm:ss").alias(
            "last_activity"
        ),
        F.date_format("ts_added", "yyyy-MM-dd HH:mm:ss").alias("ts_added"),
        F.date_format(F.element_at("_ttl", "warden"), "yyyy-MM-dd HH:mm:ss")
        .alias("ttl_warden"),
    )


# ---------------------------------------------------------------------------
# §3.2 read path over the typed record table (VERDICT r2 #4)
# ---------------------------------------------------------------------------

_CATS = ["click", "error", "purchase", "signup", "view"]
_SUBNET_HI = 167772160 + 100 * 97  # first 100 entities' /25-ish slice


@query(
    "read_path_typed",
    f"""{_IPREC_CTES},
    prof AS (
      SELECT r.id AS _id, coalesce(p.rep, 0.0) AS rep,
             coalesce(t.types_str, '') AS types_str
      FROM rec r
      LEFT JOIN types t ON t.id = r.id
      LEFT JOIN rep p ON p.id = r.id
    ),
    topk AS (
      SELECT _id, rep FROM prof
      WHERE _id < {_SUBNET_HI}
        AND list_contains(string_split(types_str, ','), 'error')
        AND rep >= 0.01
      ORDER BY rep DESC, _id LIMIT 15
    ),
    enr AS (
      SELECT k._id, k.rep, c.c_name AS hostname, n.n_name AS ctry
      FROM topk k
      LEFT JOIN customer c ON c.c_custkey = (k._id - 167772160) // 97
      LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    )
    SELECT e._id, e.rep, e.hostname, e.ctry, d.date,
      {", ".join(
        f"CAST(coalesce(sum(d.n) FILTER (WHERE d.cat = '{c}'), 0) AS BIGINT)"
        f" AS n_{c}" for c in _CATS)}
    FROM enr e JOIN daily d ON d.id = e._id
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def read_path_typed(spark, sf_dir):
    """The /ips detail trace (SURVEY §3.2) as ONE plan over the typed
    record table: EntityQuery-style filter (P2 subnet range + P5
    multi-value on events_meta.types + rep threshold) -> top-k by
    reputation (W1, TakeOrderedAndProject) -> J2 enrichment hops to
    the customer/nation dims (broadcast) -> W5 date-by-category pivot
    of the selected records' events[] (reference:
    NERDweb/nerd_main.py:1048-1190 search + :1284-1405 detail page).

    Scale shape: the record build is the §3.1 plan (bounded by live-IP
    cardinality); filter+top-k prune to 15 records BEFORE any join or
    explode, so enrichment and pivot touch 15 rows x their events —
    the same asymmetric fan-in the reference's Mongo query + per-IP
    detail fetch has, minus the N+1 round trips.
    """
    ex = _exploded_from_events(spark, sf_dir)
    as_of = ex.agg(F.max("detect_ts").alias("as_of"))
    recs = build_ip_records(ex, as_of)
    m = F.col("events_meta")
    top = (
        recs.filter(
            (F.col("_id") < _SUBNET_HI)
            & F.array_contains(m["types"], "error")
            & (F.col("rep") >= 0.01)
        )
        # project away the record's NULL enrichment placeholders —
        # the J2 hop below supplies hostname/geo (and column pruning
        # keeps the record build from materializing them at all)
        .select("_id", "rep", "events")
        .orderBy(F.col("rep").desc(), "_id")
        .limit(15)
    )
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity"),
        F.col("c_name").alias("hostname"),
        "c_nationkey",
    )
    nat = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("ctry")
    )
    enr = (
        top.withColumn(
            "entity", ((F.col("_id") - F.lit(167772160)) / 97).cast("long")
        )
        .join(F.broadcast(cust), "entity", "left")
        .join(F.broadcast(nat), "c_nationkey", "left")
    )
    piv = (
        enr.select("_id", "rep", "hostname", "ctry", F.explode("events").alias("e"))
        .groupBy(
            "_id", "rep", "hostname", "ctry", F.col("e.date").alias("date")
        )
        .pivot("e.cat", _CATS)
        .sum("e.n")
        .na.fill(dict.fromkeys(_CATS, 0))
    )
    return piv.select(
        "_id", "rep", "hostname", "ctry", "date",
        *[F.col(c).cast("long").alias(f"n_{c}") for c in _CATS],
    )
