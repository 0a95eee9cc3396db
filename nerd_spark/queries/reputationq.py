"""A6/A7 config-driven multi-source reputation queries.

Five source extractors (warden / dshield / blacklists / otx / misp)
mapped deterministically onto the synthetic ``events`` table, each
scored by the shared decay-weighted partial-reputation operator with
its reputation.yml parameters, then combined with per-source trust
factors (reference: NERDd/modules/reputation.py:90-221,
etc/reputation.yml:24-61). See nerd_spark/plans/reputation.py for the
extractor catalogue and the source→events mapping table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nerd_spark.plans import reputation as R
from nerd_spark.queries.base import query, t

# Weight denominators (constants — sum of decay weights over the full
# date range, reference reputation.py:120-133).
_DEN_LIN_14 = R.DEFAULT_REP_CONFIG["warden"].weight_denominator()   # 7.5
_DEN_LIN_30 = R.DEFAULT_REP_CONFIG["otx"].weight_denominator()      # 15.5

_NL = R.nonlin_capped_sql

# Shared DuckDB CTEs: per-row base with the derived columns every
# extractor needs, plus the as_of anchor.
_BASE_SQL = """
  as_of AS (SELECT CAST(max(ts) AS DATE) AS ad FROM events),
  base AS (
    SELECT user_id AS entity, CAST(ts AS DATE) AS d, event_type AS cat,
           CAST(floor(value) AS BIGINT) AS fv,
           CAST(json_extract(props, '$.k') AS BIGINT) % 5 AS bl
    FROM events
  )
"""

_SEV_CASE = (
    "CASE bl WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 3 "
    "WHEN 3 THEN 5 WHEN 4 THEN 8 ELSE 0 END"
)

_DSHIELD_SQL = f"""
  ds_daily AS (
    SELECT entity, d, sum(fv) AS ne, count(*) AS ndet
    FROM base WHERE cat = 'purchase' GROUP BY 1, 2
  ),
  ds AS (
    SELECT entity,
           round(sum({_NL("ne", 200)} * {_NL("ndet", 100)}
                 * (14 - date_diff('day', d, ad)) / 14.0) / {_DEN_LIN_14}, 6)
             AS rep_dshield
    FROM ds_daily, as_of WHERE date_diff('day', d, ad) < 14 GROUP BY 1
  )
"""

_BLACKLISTS_SQL = f"""
  bl_ids AS (SELECT DISTINCT entity, d, bl FROM base WHERE cat = 'error'),
  bl_pts AS (
    SELECT entity, d, sum({_SEV_CASE}) AS pts FROM bl_ids GROUP BY 1, 2
  ),
  blr AS (
    SELECT entity, round(sum({_NL("pts", 20)}) / 1.0, 6) AS rep_blacklists
    FROM bl_pts, as_of WHERE date_diff('day', d, ad) < 1 GROUP BY 1
  )
"""

_WARDEN_SQL = f"""
  w_daily AS (
    SELECT entity, d, count(*) AS ne, count(DISTINCT cat) AS ndet
    FROM base GROUP BY 1, 2
  ),
  w AS (
    SELECT entity,
           round(sum({_NL("ne", 10)} * {_NL("ndet", 2)}
                 * (14 - date_diff('day', d, ad)) / 14.0) / {_DEN_LIN_14}, 6)
             AS rep_warden
    FROM w_daily, as_of WHERE date_diff('day', d, ad) < 14 GROUP BY 1
  )
"""

_OTX_SQL = f"""
  otx_daily AS (
    SELECT entity, d, count(*) AS ne FROM base WHERE cat = 'click' GROUP BY 1, 2
  ),
  otx AS (
    SELECT entity,
           round(sum({_NL("ne", 1)}
                 * (30 - date_diff('day', d, ad)) / 30.0) / {_DEN_LIN_30}, 6)
             AS rep_otx
    FROM otx_daily, as_of WHERE date_diff('day', d, ad) < 30 GROUP BY 1
  )
"""

# All MISP events count as published today (reference get_misp_data
# reputation.py:213-221) — no date filter, rep = nonlin(total)/1.
_MISP_SQL = f"""
  misp AS (
    SELECT entity, round({_NL("count(*)", 5)}, 6) AS rep_misp
    FROM base WHERE cat = 'signup' GROUP BY entity
  )
"""


def _daily_and_asof(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    as_of = ev.agg(F.max("ts").alias("as_of"))
    return R.base_daily(ev), as_of


@query(
    "a6_rep_dshield",
    f"WITH {_BASE_SQL}, {_DSHIELD_SQL} "
    "SELECT entity AS user_id, rep_dshield FROM ds",
)
def a6_rep_dshield(spark, sf_dir):
    # (reference: get_dshield_data reputation.py:162-177; params
    # etc/reputation.yml:38-45 — scales 200/100, 14d linear decay)
    daily, as_of = _daily_and_asof(spark, sf_dir)
    return R.partial_reputation(
        R.dshield_daily(daily), as_of, R.DEFAULT_REP_CONFIG["dshield"],
        out="rep_dshield",
    ).select(F.col("entity").alias("user_id"), "rep_dshield")


@query(
    "a6_rep_blacklists",
    f"WITH {_BASE_SQL}, {_BLACKLISTS_SQL} "
    "SELECT entity AS user_id, rep_blacklists FROM blr",
)
def a6_rep_blacklists(spark, sf_dir):
    # (reference: get_blacklists_data reputation.py:179-197 —
    # severity-weighted evidence points over the day's distinct
    # blacklists; params etc/reputation.yml:33-37 — scale 20,
    # date_range 1, no decay)
    daily, as_of = _daily_and_asof(spark, sf_dir)
    return R.partial_reputation(
        R.blacklists_daily(daily), as_of, R.DEFAULT_REP_CONFIG["blacklists"],
        out="rep_blacklists",
    ).select(F.col("entity").alias("user_id"), "rep_blacklists")


@query(
    "a7_total_multi",
    f"""
    WITH {_BASE_SQL}, {_WARDEN_SQL}, {_DSHIELD_SQL}, {_BLACKLISTS_SQL},
    {_OTX_SQL}, {_MISP_SQL},
    parts AS (
      SELECT entity, 'warden' AS src, rep_warden AS r FROM w
      UNION ALL SELECT entity, 'dshield', rep_dshield FROM ds
      UNION ALL SELECT entity, 'blacklists', rep_blacklists FROM blr
      UNION ALL SELECT entity, 'otx', rep_otx FROM otx
      UNION ALL SELECT entity, 'misp', rep_misp FROM misp
    )
    SELECT entity AS user_id,
      round(1 - (1 - coalesce(max(CASE WHEN src = 'warden' THEN r END), 0) * 1.0)
              * (1 - coalesce(max(CASE WHEN src = 'dshield' THEN r END), 0) * 0.5)
              * (1 - coalesce(max(CASE WHEN src = 'blacklists' THEN r END), 0) * 1.0)
              * (1 - coalesce(max(CASE WHEN src = 'otx' THEN r END), 0) * 1.0)
              * (1 - coalesce(max(CASE WHEN src = 'misp' THEN r END), 0) * 1.0), 6)
        AS rep
    FROM parts GROUP BY entity
    """,
)
def a7_total_multi(spark, sf_dir):
    # (reference: rep_total reputation.py:100-109 — probabilistic OR
    # with per-source trust_factor; dshield trust 0.5 from yml :44)
    #
    # Plan: ONE event scan → one (entity, day, cat) shuffle shared by
    # all five extractor branches (Catalyst ReusedExchange), then a
    # union of tiny per-entity frames + a single conditional-agg
    # group-by — no 5-way outer-join chain.
    daily, as_of = _daily_and_asof(spark, sf_dir)
    cfg = R.DEFAULT_REP_CONFIG
    parts = [
        (
            R.partial_reputation(R.warden_daily(daily), as_of, cfg["warden"]),
            "warden", cfg["warden"].trust_factor,
        ),
        (
            R.partial_reputation(R.dshield_daily(daily), as_of, cfg["dshield"]),
            "dshield", cfg["dshield"].trust_factor,
        ),
        (
            R.partial_reputation(
                R.blacklists_daily(daily), as_of, cfg["blacklists"]
            ),
            "blacklists", cfg["blacklists"].trust_factor,
        ),
        (
            R.partial_reputation(R.otx_daily(daily), as_of, cfg["otx"]),
            "otx", cfg["otx"].trust_factor,
        ),
        (
            R.partial_reputation(
                R.misp_daily(daily, as_of), as_of, cfg["misp"]
            ),
            "misp", cfg["misp"].trust_factor,
        ),
    ]
    return R.combine_total(parts).select(
        F.col("entity").alias("user_id"), "rep"
    )
