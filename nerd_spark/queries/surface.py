"""Query-surface family: threat categorization (P11), tag rules
(§2.9 DSL), and the full /ips read path (§3.2) — each as an
oracle-checked query over the events-derived entity model.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nerd_spark.functions.ip import ipstr2int
from nerd_spark.plans import derivations as D
from nerd_spark.plans.categorization import CategoryRule, categorize
from nerd_spark.plans.filters import EntityQuery, search
from nerd_spark.plans.tags_dsl import tag_table
from nerd_spark.queries.base import _REP_SQL, query, t
from nerd_spark.queries.golden import golden_oracle

# ---------------------------------------------------------------------------
# P11 — threat categorization triggers
# ---------------------------------------------------------------------------

_CAT_RULES = [
    CategoryRule("volumetric", "value > 150"),
    CategoryRule("faulty", "event_type == 'error' and value > 50", "event_type"),
    CategoryRule("suspicious_signup", "event_type matches 'sign.*' and k > 50", "k"),
]


@query(
    "p11_threat_categorization",
    """
    WITH ev AS (
      SELECT event_id, event_type, value,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_id, 'volumetric' AS category, CAST(NULL AS VARCHAR) AS subcategory
    FROM ev WHERE value > 150
    UNION ALL
    SELECT event_id, 'faulty', event_type
    FROM ev WHERE event_type = 'error' AND value > 50
    UNION ALL
    SELECT event_id, 'suspicious_signup', CAST(k AS VARCHAR)
    FROM ev WHERE regexp_matches(event_type, '^(sign.*)$') AND k > 50
    """,
)
def p11_threat_categorization(spark, sf_dir):
    # (reference: common/threat_categorization.py:112-195 — per-category
    # trigger predicates with '->' subcategory extraction, compiled
    # from config to Column predicates via the tags DSL)
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    return categorize(ev, _CAT_RULES).select("event_id", "category", "subcategory")


# ---------------------------------------------------------------------------
# Tags DSL — rule-based tags over the entity profile
# ---------------------------------------------------------------------------

_PROFILE_SQL = """
  per_cat AS (
    SELECT user_id AS entity, event_type AS cat, count(*) AS n
    FROM events GROUP BY 1, 2
  ),
  profile AS (
    SELECT entity,
           CAST(sum(n) AS BIGINT) AS total,
           sum(CASE WHEN cat = 'error' THEN n ELSE 0 END) * 1.0 / sum(n) AS err_share,
           list_sort(list_distinct(list(cat))) AS types,
           list_sort(list({'cat': cat, 'n': n})) AS events
    FROM per_cat GROUP BY 1
  )
"""

_TAGS_CFG = {
    "heavy": {"condition": "total >= 80", "confidence": "total / 200", "info": "total={total}"},
    "error_prone": {"condition": "err_share > 0.25", "confidence": "err_share"},
    "multi_type": {"condition": "'purchase' in types and 'error' in types"},
    # backtick JSONPath list variable over the nested events[] array
    # (reference grammar tags.py:386-410,477-492; shipped usage shape
    # etc/tags.yml:172,178)
    "has_signup": {"condition": "'signup' in `$.events[*].cat`"},
}


@query(
    "tags_rules",
    f"""
    WITH {_PROFILE_SQL}
    SELECT entity AS user_id, 'heavy' AS tag,
           round(total / 200.0, 6) AS confidence,
           'total=' || total::VARCHAR AS info
    FROM profile WHERE total >= 80
    UNION ALL
    SELECT entity, 'error_prone', round(err_share, 6), CAST(NULL AS VARCHAR)
    FROM profile WHERE err_share > 0.25
    UNION ALL
    SELECT entity, 'multi_type', 1.0, CAST(NULL AS VARCHAR)
    FROM profile
    WHERE list_contains(types, 'purchase') AND list_contains(types, 'error')
    UNION ALL
    SELECT entity, 'has_signup', 1.0, CAST(NULL AS VARCHAR)
    FROM profile WHERE len(list_filter(events, e -> e.cat = 'signup')) > 0
    """,
)
def tags_rules(spark, sf_dir):
    # (reference: etc/tags.yml:46-80 tag configs; modules/tags.py
    # lexer/parser/interpreter — here compiled to Column expressions,
    # see plans/tags_dsl.py)
    ev = t(spark, sf_dir, "events")
    per_cat = ev.groupBy(
        F.col("user_id").alias("entity"), F.col("event_type").alias("cat")
    ).agg(F.count("*").alias("n"))
    profile = per_cat.groupBy("entity").agg(
        F.sum("n").alias("total"),
        (
            F.sum(F.when(F.col("cat") == "error", F.col("n")).otherwise(0))
            / F.sum("n")
        ).alias("err_share"),
        F.sort_array(F.collect_set("cat")).alias("types"),
        F.sort_array(F.collect_list(F.struct("cat", "n"))).alias("events"),
    )
    return tag_table(profile, _TAGS_CFG).select(
        F.col("entity").alias("user_id"), "tag", "confidence", "info"
    )


# ---------------------------------------------------------------------------
# §3.2 — the full /ips read path: filter builder + sort/limit + joins
# ---------------------------------------------------------------------------


@query(
    "read_path_search",
    f"""
    WITH {_REP_SQL},
    snapshot AS (
      SELECT e.user_id,
             167772160 + ((e.user_id // 256) % 256) * 256 + (e.user_id % 256) AS ip_int,
             count(*) AS total,
             list_sort(list_distinct(list(e.event_type))) AS cats
      FROM events e GROUP BY 1
    )
    SELECT s.user_id, s.ip_int, s.total, coalesce(r.rep_events, 0) AS rep
    FROM snapshot s LEFT JOIN rep r ON r.entity = s.user_id
    WHERE s.ip_int BETWEEN 167772160 AND 167772175      -- 10.0.0.0/28
      AND list_contains(s.cats, 'error')
      AND coalesce(r.rep_events, 0) >= 0.1
    ORDER BY rep DESC, s.user_id LIMIT 10
    """,
)
def read_path_search(spark, sf_dir):
    # The §3.2 read path end to end: entity snapshot + enrichment join
    # + EntityQuery filter compilation (P2+P5 families) + top-k (W1)
    # (reference: nerd_main.py:1048-1190).
    ev = t(spark, sf_dir, "events")
    ip = F.concat_ws(
        ".",
        F.lit(10),
        F.lit(0),
        ((F.col("user_id") / 256).cast("long") % 256).cast("string"),
        (F.col("user_id") % 256).cast("string"),
    )
    snapshot = ev.groupBy(F.col("user_id").alias("entity")).agg(
        F.first(ipstr2int(ip)).alias("ip_int"),
        F.count("*").alias("total"),
        F.sort_array(F.collect_set("event_type")).alias("cats"),
    )
    as_of = ev.agg(F.max("ts").alias("as_of"))
    rep = D.source_reputation(
        D.with_as_of(D.daily_rollup(ev, "user_id"), as_of), out="rep_events"
    )
    profile = snapshot.join(rep, "entity", "left").withColumn(
        "rep", F.coalesce("rep_events", F.lit(0.0))
    )
    spec = EntityQuery(subnet="10.0.0.0/28", cats_all=["error"], rep_min=0.1)
    out = search(profile, spec, sort_by="rep", ascending=False, limit=10)
    return out.select(F.col("entity").alias("user_id"), "ip_int", "total", "rep")


# ---------------------------------------------------------------------------
# J4 scale path — bucketed range join (same result as j4_range_join)
# ---------------------------------------------------------------------------

from nerd_spark.operators.rangejoin import bucketed_range_join  # noqa: E402
from nerd_spark.queries.relational import _J4_BANDS  # noqa: E402


@query(
    "j4_range_join_bucketed",
    f"""
    WITH bands(lo, hi, band) AS (
      VALUES {", ".join(f"({lo}, {hi}, '{b}')" for lo, hi, b in _J4_BANDS)}
    )
    SELECT band, count(*) AS n,
           round(CAST(sum(CAST(round(value, 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
    FROM events JOIN bands ON value >= lo AND value < hi
    GROUP BY band
    """,
)
def j4_range_join_bucketed(spark, sf_dir):
    # The 100 TB variant of J4: ranges expand to fixed-width buckets,
    # probe equi-joins on bucket id, exact predicate re-checked — a
    # shuffle hash join instead of a broadcast nested loop (see
    # operators/rangejoin.py). Same oracle as j4_range_join.
    from nerd_spark.queries.base import exact_sum

    ev = t(spark, sf_dir, "events")
    # half-open bands: hi - epsilon turns the closed-interval operator
    # into [lo, hi); the open-ended top band is clamped to a finite
    # bound (bucket expansion needs bounded ranges — an unbounded
    # range would enumerate every bucket)
    bands = spark.createDataFrame(
        [(lo, min(hi, 1e5) - 1e-9, b) for lo, hi, b in _J4_BANDS],
        "lo double, hi double, band string",
    )
    joined = bucketed_range_join(ev, bands, "value", "lo", "hi", bucket_width=50)
    return joined.groupBy("band").agg(
        F.count("*").alias("n"), exact_sum("value", "sum_value")
    )


# ---------------------------------------------------------------------------
# FMP batch scoring (§3.3): feature assembly + vectorized model UDF
# ---------------------------------------------------------------------------


def _fmp_oracle(training: bool) -> str:
    from nerd_spark.ml.fmp import fmp_oracle_sql

    return fmp_oracle_sql(training=training)


@query("fmp_score", _fmp_oracle(training=False))
def fmp_score(spark, sf_dir):
    # (reference: NERDd/fmp_updater.py:577-646 — the daily full-
    # collection pandas pass, rebuilt as distributed feature stages +
    # an Arrow-batched scoring UDF over the 39-feature parity vector;
    # the logistic stub stands in for the XGBoost model so the math is
    # oracle-checkable. The oracle SQL is generated from the same
    # FEATURE_SPEC that drives the Spark assembly — one source of
    # truth for features, transforms, and coefficients.)
    from nerd_spark.ml.fmp import FEATURES, fmp_pipeline

    ev = t(spark, sf_dir, "events")
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    return fmp_pipeline(ev, cust, nat).select(
        F.col("entity").alias("user_id"), *FEATURES, "fmp"
    )


@query("fmp_training_frame", _fmp_oracle(training=True))
def fmp_training_frame(spark, sf_dir):
    # (reference: fmp_updater.py:527-575 — feature + 24h-label logging
    # for model retraining; here a forward-looking temporal split over
    # the full 39-feature vector, see ml/fmp.py)
    from nerd_spark.ml.fmp import FEATURES, training_frame

    ev = t(spark, sf_dir, "events")
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    out = training_frame(ev, cust, nat)
    return out.select(
        F.col("entity").alias("user_id"),
        *FEATURES,
        F.col("label").cast("int").alias("label"),
    )


@query("fmp_score_gbt", golden_oracle("fmp_score_gbt"))
# Boosted-tree scores have no closed-form SQL oracle; the oracle is
# the committed pinned-seed golden (queries/golden.py). Determinism +
# AUC + no-Python-in-plan are additionally pinned by
# tests/test_fmp_train.py::test_gbt_train_score_roundtrip.
def fmp_score_gbt(spark, sf_dir):
    # Train->score roundtrip for the Spark-native GBT family
    # (ml/gbt.py): fit on the temporal training frame, score the full
    # feature frame with JVM-side tree evaluation (model.transform —
    # no Python UDF, no Arrow hop in the scoring plan). Seeded, so
    # the driver's rows-only check sees a stable result set.
    from nerd_spark.ml.fmp import fmp_pipeline, training_frame
    from nerd_spark.ml.gbt import fit_gbt, score_gbt

    ev = t(spark, sf_dir, "events")
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    model = fit_gbt(training_frame(ev, cust, nat), max_iter=10, max_depth=3)
    feats = fmp_pipeline(ev, cust, nat).drop("fmp")
    return score_gbt(feats, model).select(
        F.col("entity").alias("user_id"), F.col("fmp").alias("fmp_gbt")
    )


# ---------------------------------------------------------------------------
# S4 — MISP/OTX threat-intel batch parsers
# ---------------------------------------------------------------------------


def _synthetic_misp_export(spark, sf_dir):
    """Deterministic MISP event export synthesized from the signup
    rows of `events`: event id = props.k % 30 (event-level fields are
    functions of the id), one IP attribute per row with the attribute
    type cycling through the four forms the receiver parses."""
    from nerd_spark.functions.ip import int2ipstr
    from nerd_spark.ml.fmp import IP_BASE, IP_STRIDE

    s = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select(
            "event_id",
            "user_id",
            "ts",
            (F.get_json_object("props", "$.k").cast("long") % 30).alias("mid"),
        )
        .withColumn("ipint", F.lit(IP_BASE) + F.col("user_id") * IP_STRIDE)
        .withColumn("ipstr", int2ipstr("ipint"))
        .withColumn("tform", F.col("user_id") % 4)
    )
    attr_type = (
        F.when(F.col("tform") == 0, "ip-src")
        .when(F.col("tform") == 1, "ip-dst")
        .when(F.col("tform") == 2, "ip-src|port")
        .otherwise("domain|ip")
    )
    attr_value = (
        F.when(F.col("tform") == 2, F.concat("ipstr", F.lit("|443")))
        .when(F.col("tform") == 3, F.concat(F.lit("example.com|"), "ipstr"))
        .otherwise(F.col("ipstr"))
    )
    attrs = F.struct(
        F.col("event_id").cast("string").alias("id"),
        attr_type.alias("type"),
        attr_value.alias("value"),
        (F.col("user_id") % 10 == 0).alias("deleted"),
    )
    mid = F.col("mid")
    tags = F.when(
        mid % 3 == 0,
        F.array(F.struct(F.lit("tlp:white").alias("name"), F.lit("#fff").alias("colour"))),
    ).otherwise(
        F.array(
            F.struct(
                F.concat(F.lit("t"), mid.cast("string")).alias("name"),
                F.lit("#0f0").alias("colour"),
            )
        )
    )
    return (
        s.withColumn("attribute", attrs)
        .groupBy("mid")
        .agg(
            F.min(F.to_date("ts")).alias("date"),
            F.min(F.unix_timestamp("ts")).alias("timestamp"),
            F.sort_array(F.collect_list("attribute")).alias("attributes"),
        )
        .select(
            mid.cast("string").alias("id"),
            F.concat(F.lit("org"), (mid % 5).cast("string")).alias("orgc"),
            F.concat(F.lit("ev"), mid.cast("string")).alias("info"),
            "date",
            "timestamp",
            (F.lit(1) + mid % 4).cast("string").alias("threat_level_id"),
            tags.alias("tags"),
            "attributes",
        )
    )


@query(
    "s4_misp_upserts",
    """
    WITH s AS (
      SELECT user_id, ts,
             CAST(json_extract(props, '$.k') AS BIGINT) % 30 AS mid,
             167772160 + user_id * 97 AS ipint,
             user_id % 4 AS tform
      FROM events WHERE event_type = 'signup'
    ),
    ev AS (
      SELECT mid, min(CAST(ts AS DATE)) AS d,
             min(CAST(floor(epoch(ts)) AS BIGINT)) AS tstamp
      FROM s GROUP BY 1
    )
    SELECT
      (ipint // 16777216)::VARCHAR || '.' || ((ipint // 65536) % 256)::VARCHAR
        || '.' || ((ipint // 256) % 256)::VARCHAR || '.' || (ipint % 256)::VARCHAR AS ip,
      mid::VARCHAR AS event_id,
      'org' || (mid % 5)::VARCHAR AS org_created,
      'ev' || mid::VARCHAR AS info,
      CASE WHEN tform IN (0, 2) THEN 'src' ELSE 'dst' END AS role,
      CASE WHEN mid % 3 = 0 THEN 'white' ELSE 'green' END AS tlp,
      CASE WHEN mid % 3 = 0 THEN '' ELSE 't' || mid::VARCHAR END AS tag_names,
      CASE (1 + mid % 4) WHEN 1 THEN 'High' WHEN 2 THEN 'Medium'
           WHEN 3 THEN 'Low' ELSE 'Undefined' END AS threat_level,
      strftime(ev.d, '%Y-%m-%d') AS date,
      CAST(to_timestamp(ev.tstamp) AS TIMESTAMP) AS last_change
    FROM s JOIN ev USING (mid)
    WHERE user_id % 10 != 0
    """,
)
def s4_misp_upserts(spark, sf_dir):
    # (reference: NERDd/misp_receiver.py:184-312 — event parse, IP
    # extraction per attribute type, tlp from tags, threat-level map,
    # per-IP array_upsert payloads; batch-parsed here from an exported
    # event frame, see sources/intel.py)
    from nerd_spark.sources.intel import parse_misp_events

    export = _synthetic_misp_export(spark, sf_dir)
    out = parse_misp_events(export)
    return out.select(
        "ip", "event_id", "org_created", "info", "role", "tlp",
        F.array_join("tag_names", "|").alias("tag_names"),
        "threat_level",
        F.col("date").cast("string").alias("date"),
        "last_change",
    )


# ---------------------------------------------------------------------------
# §2.8 scheduled recompute: NRU (next-regular-update) due scan
# ---------------------------------------------------------------------------


@query(
    "nru_due_selection",
    """
    WITH ent AS (
      SELECT user_id,
             CAST(floor(epoch(min(ts))) AS BIGINT) AS added,
             CAST(floor(epoch(max(ts))) AS BIGINT) AS last_act
      FROM events GROUP BY 1
    ),
    anchor AS (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS now_e FROM events),
    sched AS (
      SELECT user_id, added,
             added + ((last_act - added) // 86400 + 1) * 86400 AS nru_1d
      FROM ent
    )
    SELECT user_id, nru_1d,
           CAST((now_e - nru_1d) // 86400 AS BIGINT) AS overdue_days
    FROM sched, anchor
    WHERE nru_1d <= now_e
    ORDER BY nru_1d, user_id LIMIT 100000
    """,
)
def nru_due_selection(spark, sf_dir):
    # (reference: modules/update_planner.py:31-38 — !NEW stamps
    # _nru1d = ts_added + 1 day; NERDd/updater.py:56-142 — the tick
    # scans entities with _nru <= now, limit 100k, and advances the
    # slot with the next_step op, update_manager.py:174-179. Here the
    # slot is computed with the same next_step arithmetic anchored on
    # each entity's last activity, and the due set is the updater's
    # fetch-limited scan.)
    ev = t(spark, sf_dir, "events")
    ent = ev.groupBy("user_id").agg(
        F.unix_timestamp(F.min("ts")).alias("added"),
        F.unix_timestamp(F.max("ts")).alias("last_act"),
    )
    anchor = ev.agg(F.unix_timestamp(F.max("ts")).alias("now_e"))
    day = 86400
    nru = F.col("added") + (
        F.floor((F.col("last_act") - F.col("added")) / day) + 1
    ) * day
    sched = ent.crossJoin(F.broadcast(anchor)).select(
        "user_id", nru.alias("nru_1d"), "now_e"
    )
    return (
        sched.filter(F.col("nru_1d") <= F.col("now_e"))
        .select(
            "user_id",
            "nru_1d",
            F.floor((F.col("now_e") - F.col("nru_1d")) / day)
            .cast("long")
            .alias("overdue_days"),
        )
        .orderBy("nru_1d", "user_id")
        .limit(100000)
    )


# ---------------------------------------------------------------------------
# Enrichment derivation stages: DNSBL membership + GeoLite2 geolocation
# (reference modules dnsbl.py / geolocation.py as data ops; plans/enrich.py)
# ---------------------------------------------------------------------------

_DNSBL_CFG = [
    ("bl.example.org", {"127.0.0.2": "spamlist", "127.0.0.3": "exploitlist"}),
    ("rbl.example.net", {"127.0.0.2": "rbl-policy"}),
]


@query(
    "p12_dnsbl_membership",
    """
    WITH ips AS (SELECT DISTINCT user_id FROM events),
    hits AS (
      SELECT user_id, 'spamlist' AS bl_id FROM ips WHERE user_id % 5 = 0
      UNION ALL
      SELECT user_id, 'exploitlist' FROM ips WHERE user_id % 3 = 0
      UNION ALL
      SELECT user_id, 'rbl-policy' FROM ips WHERE user_id % 7 = 0
    )
    SELECT i.user_id,
           coalesce(array_to_string(
             list_sort(list(h.bl_id) FILTER (WHERE h.bl_id IS NOT NULL)),
             '|'), '') AS bls,
           count(h.bl_id) AS n_bl
    FROM ips i LEFT JOIN hits h USING (user_id)
    GROUP BY 1
    """,
)
def p12_dnsbl_membership(spark, sf_dir):
    # DNSBL derivation stage (reference: NERDd/modules/dnsbl.py
    # query_blacklists): entity IPs fan out to reverse-name queries
    # per configured zone; a synthetic resolver answers table stands
    # in for the DNS hop (user_id % 5/3/7 rules, mirrored in the
    # oracle), including an UNKNOWN rdata (% 11 -> 127.0.0.9) the
    # zone's result map must drop. Output: per-entity sorted
    # blacklist-id set, [] when clean.
    from nerd_spark.functions.ip import int2ipstr, reverse_ip
    from nerd_spark.ml.fmp import IP_BASE, IP_STRIDE
    from nerd_spark.plans.enrich import dnsbl_stage

    ips = (
        t(spark, sf_dir, "events")
        .select(F.col("user_id").alias("entity"))
        .distinct()
        .withColumn(
            "ip", int2ipstr(F.lit(IP_BASE) + F.col("entity") * IP_STRIDE)
        )
    )

    def _answers(zone, mod, rdata):
        return ips.filter(F.col("entity") % mod == 0).select(
            F.concat(reverse_ip("ip"), F.lit("." + zone)).alias("qname"),
            F.lit(rdata).alias("rdata"),
        )

    answers = (
        _answers("bl.example.org", 5, "127.0.0.2")
        .unionByName(_answers("bl.example.org", 3, "127.0.0.3"))
        .unionByName(_answers("rbl.example.net", 7, "127.0.0.2"))
        .unionByName(_answers("bl.example.org", 11, "127.0.0.9"))
    )
    out = dnsbl_stage(ips, answers, _DNSBL_CFG)
    return out.select(
        F.col("entity").alias("user_id"),
        F.array_join("bl", "|").alias("bls"),
        F.size("bl").cast("long").alias("n_bl"),
    )


@query(
    "p13_geo_enrichment",
    """
    WITH ips AS (
      SELECT DISTINCT user_id, 167772160 + user_id * 97 AS ip_int
      FROM events
    ),
    blocks AS (
      SELECT n_nationkey AS geoname_id,
             167772160 + n_nationkey * 8192 AS ip_from,
             167772160 + n_nationkey * 8192 + 8191 AS ip_to
      FROM nation WHERE n_nationkey < 10
    ),
    loc AS (
      SELECT n_nationkey AS geoname_id,
             'C' || n_nationkey::VARCHAR AS country_iso_code,
             n_name AS city_name,
             'Zone/' || n_name AS time_zone
      FROM nation
    )
    SELECT i.user_id,
           l.country_iso_code AS geo_ctry,
           l.city_name AS geo_city,
           l.time_zone AS geo_tz
    FROM ips i
    LEFT JOIN blocks b ON i.ip_int BETWEEN b.ip_from AND b.ip_to
    LEFT JOIN loc l ON b.geoname_id = l.geoname_id
    """,
)
def p13_geo_enrichment(spark, sf_dir):
    # Geolocation derivation stage (reference: NERDd/modules/
    # geolocation.py geoloc): the GeoLite2 CSV layout — /19 blocks
    # synthesized from `nation` as real CIDR STRINGS (so the stage's
    # CIDR parse executes) + a locations dim — broadcast range join,
    # LEFT semantics (an IP outside every block keeps NULL geo).
    from nerd_spark.functions.ip import int2ipstr
    from nerd_spark.ml.fmp import IP_BASE, IP_STRIDE
    from nerd_spark.plans.enrich import geo_stage

    ips = (
        t(spark, sf_dir, "events")
        .select(F.col("user_id").alias("entity"))
        .distinct()
        .withColumn("ip_int", F.lit(IP_BASE) + F.col("entity") * IP_STRIDE)
    )
    nation = t(spark, sf_dir, "nation")
    blocks = nation.filter(F.col("n_nationkey") < 10).select(
        F.concat(
            int2ipstr(F.lit(IP_BASE) + F.col("n_nationkey") * 8192),
            F.lit("/19"),
        ).alias("network"),
        F.col("n_nationkey").alias("geoname_id"),
    )
    locations = nation.select(
        F.col("n_nationkey").alias("geoname_id"),
        F.concat(F.lit("C"), F.col("n_nationkey").cast("string")).alias(
            "country_iso_code"
        ),
        F.col("n_name").alias("city_name"),
        F.concat(F.lit("Zone/"), F.col("n_name")).alias("time_zone"),
    )
    return geo_stage(ips, blocks, locations).select(
        F.col("entity").alias("user_id"), "geo_ctry", "geo_city", "geo_tz"
    )


@query(
    "p14_ptr_hostname",
    r"""
    WITH ips AS (SELECT DISTINCT user_id FROM events),
    ans AS (
      SELECT user_id,
             'host-' || user_id::VARCHAR || '.example.com.' AS rdata
      FROM ips WHERE user_id % 4 = 0
      UNION ALL
      SELECT user_id, 'alt-' || user_id::VARCHAR || '.example.net.'
      FROM ips WHERE user_id % 6 = 0
    ),
    first AS (SELECT user_id, min(rdata) AS rdata FROM ans GROUP BY 1)
    SELECT i.user_id, regexp_replace(f.rdata, '\.$', '') AS hostname
    FROM ips i LEFT JOIN first f USING (user_id)
    """,
)
def p14_ptr_hostname(spark, sf_dir):
    # Reverse-DNS derivation stage (reference: NERDd/modules/dns.py
    # get_hostname): entity IPs build in-addr.arpa reverse names; a
    # synthetic PTR answers table stands in for the resolver hop
    # (user_id % 4 -> host-N.example.com. with the trailing dot the
    # stage must trim; % 6 adds a SECOND record to exercise the
    # deterministic-first collapse; everything else is NXDOMAIN ->
    # hostname NULL, the reference's stored None).
    from nerd_spark.functions.ip import int2ipstr, reverse_ip
    from nerd_spark.ml.fmp import IP_BASE, IP_STRIDE
    from nerd_spark.plans.enrich import ptr_hostname_stage

    ips = (
        t(spark, sf_dir, "events")
        .select(F.col("user_id").alias("entity"))
        .distinct()
        .withColumn(
            "ip", int2ipstr(F.lit(IP_BASE) + F.col("entity") * IP_STRIDE)
        )
    )
    qname = F.concat(reverse_ip("ip"), F.lit(".in-addr.arpa"))

    def _ans(mod, prefix, suffix):
        return ips.filter(F.col("entity") % mod == 0).select(
            qname.alias("qname"),
            F.concat(
                F.lit(prefix), F.col("entity").cast("string"), F.lit(suffix)
            ).alias("rdata"),
        )

    answers = _ans(4, "host-", ".example.com.").unionByName(
        _ans(6, "alt-", ".example.net.")
    )
    return ptr_hostname_stage(ips, answers).select(
        F.col("entity").alias("user_id"), "hostname"
    )

@query(
    "p15_as_class",
    """
    WITH asns AS (
      SELECT DISTINCT user_id, user_id % 40 AS asn FROM events
    ),
    dim AS (
      SELECT n_nationkey AS asn,
             'CAIDA_' || CAST(n_nationkey % 2 AS VARCHAR) AS source,
             CASE n_nationkey % 3 WHEN 0 THEN 'Transit/Access'
                  WHEN 1 THEN 'Content' ELSE 'Enterprise' END AS cls
      FROM nation
    )
    SELECT a.user_id,
           coalesce(CASE WHEN d.cls = 'Transit/Access' THEN 'access'
                         ELSE d.cls END, 'unknown') AS as_class_v,
           CASE WHEN d.source = 'CAIDA_1' THEN CAST(0.7 AS DOUBLE)
           END AS as_class_c
    FROM asns a LEFT JOIN dim d USING (asn)
    """,
)
def p15_as_class(spark, sf_dir):
    # CAIDA AS-class enrichment stage (reference: NERDd/modules/
    # caida_as_class.py — asn !NEW -> determine_type -> caida_as_class
    # .v/.c): the as2types list is synthesized from `nation` as raw
    # "asn|source|class" LINES (so the stage's parser executes),
    # salted with a comment line and a non-numeric-asn line the parser
    # must drop (parse_list:58-71 logs-and-skips). Config exercises
    # both knobs: a class remap (classes.Transit/Access -> 'access')
    # and a per-source confidence (CAIDA_1 -> 0.7, stored only when
    # != 1). ASNs 25-39 miss the 25-row dim -> 'unknown'.
    from nerd_spark.plans.enrich import as_class_stage, parse_caida_lines

    asns = (
        t(spark, sf_dir, "events")
        .select(F.col("user_id").alias("entity"))
        .distinct()
        .withColumn("asn", F.col("entity") % 40)
    )
    nation = t(spark, sf_dir, "nation")
    lines = nation.select(
        F.concat(
            F.col("n_nationkey").cast("string"),
            F.lit("|CAIDA_"),
            (F.col("n_nationkey") % 2).cast("string"),
            F.lit("|"),
            F.element_at(
                F.array(F.lit("Transit/Access"), F.lit("Content"),
                        F.lit("Enterprise")),
                (F.col("n_nationkey") % 3 + 1).cast("int"),
            ),
        ).alias("line")
    )
    salt = spark.createDataFrame(
        [("# CAIDA as2types comment",), ("ASXX|bad|line",)], "line string"
    )
    caida = parse_caida_lines(lines.unionByName(salt))
    out = as_class_stage(
        asns,
        caida,
        class_values={"Transit/Access": "access"},
        source_confidence={"CAIDA_1": 0.7},
    )
    return out.select(
        F.col("entity").alias("user_id"), "as_class_v", "as_class_c"
    )


@query(
    "p16_reserved_ip",
    """
    WITH ips AS (
      SELECT DISTINCT user_id,
             CASE user_id % 5
               WHEN 0 THEN 167772160 + user_id
               WHEN 1 THEN 134744064 + user_id
               WHEN 2 THEN 1681915904 + user_id
               WHEN 3 THEN 3405804032 + user_id
               ELSE 3758096384 + user_id
             END AS ip_int
      FROM events
    )
    SELECT user_id,
           CASE WHEN (ip_int BETWEEN 0 AND 16777215)
                  OR (ip_int BETWEEN 167772160 AND 184549375)
                  OR (ip_int BETWEEN 1681915904 AND 1686110207)
                  OR (ip_int BETWEEN 2130706432 AND 2147483647)
                  OR (ip_int BETWEEN 2851995648 AND 2852061183)
                  OR (ip_int BETWEEN 2886729728 AND 2887778303)
                  OR (ip_int BETWEEN 3221225472 AND 3221225727)
                  OR (ip_int BETWEEN 3221225984 AND 3221226239)
                  OR (ip_int BETWEEN 3232235520 AND 3232301055)
                  OR (ip_int BETWEEN 3323068416 AND 3323199487)
                  OR (ip_int BETWEEN 3325256704 AND 3325256959)
                  OR (ip_int BETWEEN 3405803776 AND 3405804031)
                  OR (ip_int BETWEEN 3758096384 AND 4294967295)
                THEN 1 ELSE 0 END AS reserved_range
    FROM ips
    """,
)
def p16_reserved_ip(spark, sf_dir):
    # Reserved/bogon tagging stage (reference: NERDd/modules/
    # reserved_ip.py — ip !NEW -> is_reserved -> reserved_range 1/0).
    # Entity IPs are synthesized to land in five representative spots:
    # 10/8 (reserved), 8.8/16 (public), 100.64/10 (reserved CGN),
    # just past 203.0.113/24 (public), and 224/3 multicast (reserved).
    # The oracle mirrors the RESERVED_RANGES literal table as explicit
    # BETWEENs, so the range-join semantics are checked end-to-end.
    from nerd_spark.plans.enrich import reserved_ip_stage

    base = (
        F.when(F.col("entity") % 5 == 0, 167772160)
        .when(F.col("entity") % 5 == 1, 134744064)
        .when(F.col("entity") % 5 == 2, 1681915904)
        .when(F.col("entity") % 5 == 3, 3405804032)
        .otherwise(3758096384)
    )
    ips = (
        t(spark, sf_dir, "events")
        .select(F.col("user_id").alias("entity"))
        .distinct()
        .withColumn("ip_int", base + F.col("entity"))
    )
    return reserved_ip_stage(ips).select(
        F.col("entity").alias("user_id"), "reserved_range"
    )


@query(
    "p17_asn_rank",
    """
    WITH asns AS (
      SELECT DISTINCT user_id, user_id % 30 AS asn FROM events
    ),
    dim AS (
      SELECT n_nationkey AS asn,
             round(CAST(100 AS DOUBLE) / (n_nationkey + 1), 4) AS eml_rank
      FROM nation
    )
    SELECT a.user_id, d.eml_rank
    FROM asns a LEFT JOIN dim d USING (asn)
    """,
)
def p17_asn_rank(spark, sf_dir):
    # Per-ASN rank enrichment stage (reference: NERDd/modules/
    # eml_asn_rank.py — asn !NEW/every1d -> get_rank -> eml_rank; the
    # API hop snapshots into a rank dim, the same substrate
    # bgp_rank.py's CIRCL feed would use). ASNs 25-29 miss the dim ->
    # NULL eml_rank (the reference stores nothing on a failed lookup).
    from nerd_spark.plans.enrich import asn_rank_stage

    asns = (
        t(spark, sf_dir, "events")
        .select(F.col("user_id").alias("entity"))
        .distinct()
        .withColumn("asn", F.col("entity") % 30)
    )
    ranks = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("asn"),
        F.round(F.lit(100.0) / (F.col("n_nationkey") + 1), 4).alias("rank"),
    )
    return asn_rank_stage(asns, ranks).select(
        F.col("entity").alias("user_id"), "eml_rank"
    )


@query(
    "p18_bgp_rank",
    """
    WITH asns AS (
      SELECT DISTINCT user_id, user_id % 32 AS asn FROM events
    ),
    dim AS (
      SELECT n_nationkey AS asn,
             CASE WHEN n_nationkey >= 20 THEN 0.0
                  ELSE round(n_nationkey * 0.37 + 0.5, 4) END AS circl_bgprank
      FROM nation
    )
    SELECT a.user_id, d.circl_bgprank
    FROM asns a LEFT JOIN dim d USING (asn)
    """,
)
def p18_bgp_rank(spark, sf_dir):
    # CIRCL BGP-rank enrichment stage (reference: NERDd/modules/
    # bgp_rank.py set_bgprank — asn !NEW/every1d -> POST to the
    # ranking API -> set circl_bgprank). The API hop is
    # sources/apienrich.py::snapshot_bgp_ranks; here the snapshot dim
    # is synthesized with the API's THREE outcome bands: ranked
    # (asn < 20), not-found (20-24: the API answers rank 0.0 and the
    # reference STORES it), errored (25-31: absent from the snapshot
    # -> NULL, the reference stores nothing).
    from nerd_spark.plans.enrich import bgp_rank_stage

    asns = (
        t(spark, sf_dir, "events")
        .select(F.col("user_id").alias("entity"))
        .distinct()
        .withColumn("asn", F.col("entity") % 32)
    )
    ranks = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("asn"),
        F.when(F.col("n_nationkey") >= 20, F.lit(0.0))
        .otherwise(F.round(F.col("n_nationkey") * 0.37 + 0.5, 4))
        .alias("circl_bgprank"),
    )
    return bgp_rank_stage(asns, ranks).select(
        F.col("entity").alias("user_id"), "circl_bgprank"
    )


@query(
    "p19_shodan",
    """
    WITH ents AS (
      SELECT DISTINCT user_id,
             user_id % 3 = 0 AS had_shodan,
             user_id % 2 = 0 AS long_active,
             user_id % 5 = 0 AS weekly
      FROM events
    ),
    snap AS (  -- fetch snapshot: user_id%7=6 errored out (absent)
      SELECT user_id, user_id % 4 <> 1 AS found FROM ents
      WHERE user_id % 7 <> 6 AND NOT (weekly AND NOT long_active)
    ),
    dec AS (
      SELECT e.user_id, e.had_shodan,
             CASE WHEN e.weekly AND NOT e.long_active THEN 'skip'
                  WHEN s.found THEN 'set'
                  WHEN s.found = false AND e.had_shodan THEN 'remove'
                  ELSE 'none' END AS action
      FROM ents e LEFT JOIN snap s USING (user_id)
    )
    SELECT user_id, action,
           CASE WHEN action = 'set'
                THEN '22,' || (user_id % 1000)::VARCHAR END AS ports_s,
           CASE WHEN action = 'set'
                THEN CASE WHEN user_id % 2 = 0 THEN 'honeypot'
                          ELSE 'vpn,proxy' END END AS tags_s,
           CASE WHEN action = 'set'
                THEN 'cpe:/a:x:' || (user_id % 5)::VARCHAR END AS cpes_s
    FROM dec
    """,
)
def p19_shodan(spark, sf_dir):
    # Shodan/InternetDB enrichment decisions (reference: NERDd/
    # modules/shodan.py shodan()). The fetch seam is sources/
    # apienrich.py::snapshot_internetdb; the synthesized snapshot
    # exercises every reference branch: the weekly short-lived skip
    # gate, found -> set ports/tags/cpes, 404+had_shodan -> remove,
    # 404 alone / fetch error (absent row) -> no update.
    from nerd_spark.plans.enrich import shodan_decisions

    ents = (
        t(spark, sf_dir, "events")
        .select(F.col("user_id").alias("entity"))
        .distinct()
        .select(
            "entity",
            (F.col("entity") % 3 == 0).alias("had_shodan"),
            (F.col("entity") % 2 == 0).alias("long_active"),
            (F.col("entity") % 5 == 0).alias("weekly"),
        )
    )
    uid = F.col("entity")
    snap = (
        ents.filter(
            (uid % 7 != 6) & ~(F.col("weekly") & ~F.col("long_active"))
        )
        .select(
            uid.alias("ip"),
            (uid % 4 != 1).alias("found"),
            F.array(F.lit(22), (uid % 1000).cast("int")).alias("ports"),
            F.when(uid % 2 == 0, F.array(F.lit("honeypot")))
            .otherwise(F.array(F.lit("vpn"), F.lit("proxy")))
            .alias("tags"),
            F.array(F.concat(F.lit("cpe:/a:x:"), (uid % 5).cast("string")))
            .alias("cpes"),
        )
    )
    dec = shodan_decisions(ents, snap)
    return dec.select(
        F.col("entity").alias("user_id"),
        "action",
        F.array_join(F.col("ports").cast("array<string>"), ",").alias("ports_s"),
        F.array_join("tags", ",").alias("tags_s"),
        F.array_join("cpes", ",").alias("cpes_s"),
    )


@query(
    "p20_passive_dns",
    """
    WITH resolved AS (
      SELECT DISTINCT user_id,
             'host' || (user_id % 9)::VARCHAR || '.example' AS domain
      FROM events
      UNION
      SELECT DISTINCT user_id,
             'alt' || (user_id % 4)::VARCHAR || '.example' AS domain
      FROM events WHERE user_id % 3 = 0
    ),
    bl_meta AS (
      SELECT r_name AS blname,
             '2024-01-0' || (r_regionkey + 1)::VARCHAR AS t,
             r_regionkey FROM region
    ),
    bl_member AS (
      SELECT r.r_name AS blname,
             'host' || (n.n_nationkey % 9)::VARCHAR || '.example' AS domain
      FROM region r JOIN nation n ON n.n_nationkey % 5 = r.r_regionkey
      WHERE n.n_nationkey % 2 = 0
    )
    SELECT p.user_id, m.blname, p.domain,
           CASE WHEN b.domain IS NOT NULL THEN 1 ELSE 0 END AS v, m.t
    FROM resolved p
    CROSS JOIN bl_meta m
    LEFT JOIN (SELECT DISTINCT blname, domain FROM bl_member) b
      ON b.blname = m.blname AND b.domain = p.domain
    """,
)
def p20_passive_dns(spark, sf_dir):
    # Passive-DNS domain-blacklist checks (reference: NERDd/modules/
    # passive_dns.py passive_dns_query() — resolve the IP's domains,
    # check each against every Redis domain blacklist, emit v=1/v=0
    # dbl entries stamped with the list's update time). The resolver
    # hop is sources/apienrich.py::snapshot_passive_dns; membership
    # and catalogue dims are synthesized from region/nation.
    from nerd_spark.plans.enrich import passive_dns_decisions

    uid = F.col("user_id")
    base = t(spark, sf_dir, "events").select("user_id").distinct()
    resolved = (
        base.select(
            uid.alias("entity"),
            F.concat(F.lit("host"), (uid % 9).cast("string"), F.lit(".example"))
            .alias("domain"),
        )
        .unionByName(
            base.filter(uid % 3 == 0).select(
                uid.alias("entity"),
                F.concat(
                    F.lit("alt"), (uid % 4).cast("string"), F.lit(".example")
                ).alias("domain"),
            )
        )
        .distinct()
    )
    bl_meta = t(spark, sf_dir, "region").select(
        F.col("r_name").alias("blname"),
        F.concat(F.lit("2024-01-0"), (F.col("r_regionkey") + 1).cast("string"))
        .alias("t"),
    )
    nk = F.col("n_nationkey")
    bl_member = (
        t(spark, sf_dir, "region")
        .crossJoin(t(spark, sf_dir, "nation").filter(nk % 2 == 0))
        .filter(nk % 5 == F.col("r_regionkey"))
        .select(
            F.col("r_name").alias("blname"),
            F.concat(F.lit("host"), (nk % 9).cast("string"), F.lit(".example"))
            .alias("domain"),
        )
        .distinct()
    )
    return passive_dns_decisions(resolved, bl_meta, bl_member).select(
        F.col("entity").alias("user_id"), "blname", "domain", "v", "t"
    )
