"""FMP batch scoring: 39-feature parity assembly + vectorized scoring.

The reference pulls the whole `ip` collection into one pandas frame
daily and assembles a 39-dim feature vector per record — event-window
stats, EWMAs, last-alert age, inter-arrival intervals, /24-prefix
aggregates, blacklist presence flags, hostname-class tags, country and
ASN "badness" — then scores an XGBoost model (reference:
NERDd/fmp_updater.py:10-57 feature inventory, :241-290 event meta,
:292-355 prefix meta, :357-525 assembly+transforms, :577-646 the
driver-side pandas pass that is its scalability cliff, SURVEY §3.3).

This rebuild keeps the reference's feature blocks and vector order but
computes every block as a distributed aggregation:

  block             features                      reference
  events meta       alerts/conns/nodes 1d+7d,     :241-290
                    ewma, conns_ewma, bin_ewma
  last alert age    fractional days, exp decay    :414-420
  intervals         avg + median of gaps between  :228-238, 422-434
                    the last 21 event timestamps
  prefix meta       the same 8 counts + 3 EWMAs   :292-355 (J8 join-back)
                    + distinct-IP counts, per /24
                    prefix = shiftright(ip, 8)    :224-226
  blacklists        10 presence flags             :371-382,465-472
  hostname tags     exists/dynamic-static/dsl/    :474-504;
                    ip-in-hostname                etc/nerd.yml:172-186
  geo               ctry_badness, asn_badness     :161-215,506-514

Mapping onto the synthetic tables (deterministic, oracle-mirrored):
entity = events.user_id; ip_int = 167772160 + entity*97 (so /24
prefixes group ~2.6 entities); node = event_type; conns =
floor(value); blacklist id = props.k % 10 (one id per reference
blacklist, fmp_updater.py:23-32); the customer dim supplies the
hostname analog (c_name; "hostname missing" when c_acctbal < 0) and
nation the country — the full 39-feature reference vector.

Transforms (:410,419,429,463) — log1p on count blocks, exp(-x) on
ages/intervals, passthrough on flags/badness — run inside the scoring
UDF; raw features stay oracle-checkable. The logistic stub stands in
for XGBoost (absent here) behind HAVE_XGBOOST.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

try:  # real model path, absent in this environment
    import xgboost  # noqa: F401

    HAVE_XGBOOST = True
except Exception:  # pragma: no cover
    HAVE_XGBOOST = False

IP_BASE = 167772160  # 10.0.0.0 — synthetic entity->IPv4 embedding
IP_STRIDE = 97

EWMA_A, EWMA_D = 0.25, 0.75  # fmp_updater.py:79-80

# (name, transform, coefficient) in the reference's vector order
# (fmp_updater.py:10-57). Transforms: log1p | expneg | expneg7 | ident.
FEATURE_SPEC: list[tuple[str, str, float]] = [
    ("alerts_1d", "log1p", 0.05),
    ("conns_1d", "log1p", 0.01),
    ("nodes_1d", "log1p", 0.08),
    ("alerts_7d", "log1p", 0.02),
    ("conns_7d", "log1p", 0.005),
    ("nodes_7d", "log1p", 0.04),
    ("alerts_ewma", "log1p", 0.3),
    ("conns_ewma", "log1p", 0.05),
    ("binalerts_ewma", "log1p", 0.5),
    ("last_alert_age", "expneg7", 0.4),
    ("intervals_avg", "expneg", 0.2),
    ("intervals_med", "expneg", 0.15),
    ("prefix_alerts_1d", "log1p", 0.02),
    ("prefix_conns_1d", "log1p", 0.004),
    ("prefix_ips_1d", "log1p", 0.06),
    ("prefix_nodes_1d", "log1p", 0.03),
    ("prefix_alerts_7d", "log1p", 0.01),
    ("prefix_conns_7d", "log1p", 0.002),
    ("prefix_ips_7d", "log1p", 0.03),
    ("prefix_nodes_7d", "log1p", 0.015),
    ("prefix_alerts_ewma", "log1p", 0.1),
    ("prefix_conns_ewma", "log1p", 0.02),
    ("prefix_binalerts_ewma", "log1p", 0.2),
    ("bl_0", "ident", 0.25),
    ("bl_1", "ident", 0.2),
    ("bl_2", "ident", 0.15),
    ("bl_3", "ident", 0.3),
    ("bl_4", "ident", 0.1),
    ("bl_5", "ident", 0.22),
    ("bl_6", "ident", 0.35),
    ("bl_7", "ident", 0.08),
    ("bl_8", "ident", 0.17),
    ("bl_9", "ident", 0.28),
    ("hostname_exists", "ident", -0.1),
    ("dynamic_static", "ident", -0.15),
    ("dsl", "ident", 0.12),
    ("ip_in_hostname", "ident", 0.18),
    ("ctry_badness", "ident", 0.6),
    ("asn_badness", "ident", 0.8),
]
FEATURES = [n for n, _, _ in FEATURE_SPEC]
STUB_BIAS = -2.0


# ---------------------------------------------------------------------------
# Feature assembly (distributed aggregation stages)
# ---------------------------------------------------------------------------


def _prefix_of(entity):
    return F.shiftright(F.lit(IP_BASE) + entity * IP_STRIDE, 8)


def assemble_features(
    events: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    as_of: DataFrame | None = None,
    entity: str = "user_id",
) -> DataFrame:
    """Per-entity raw 39-feature frame. as_of: optional broadcastable
    single-row frame (col ``as_of``) — pass the label cutoff when
    building training frames; defaults to max(ts)."""
    if as_of is None:
        as_of = events.agg(F.max("ts").alias("as_of"))

    k = F.get_json_object("props", "$.k").cast("long")
    base = events.select(
        F.col(entity).alias("entity"),
        F.to_date("ts").alias("d"),
        F.col("event_type").alias("cat"),
        "ts",
        "event_id",
        F.floor("value").alias("conns"),
        (k % 10).alias("bl"),
    )
    lvl = (
        base.groupBy("entity", "d", "cat")
        .agg(
            F.count("*").alias("n"),
            F.sum("conns").alias("c"),
            F.max("ts").alias("mts"),
            F.collect_set("bl").alias("bls"),
        )
        .crossJoin(F.broadcast(as_of))
    )
    age = F.datediff(F.to_date("as_of"), F.col("d"))
    w = F.lit(EWMA_A) * F.pow(F.lit(EWMA_D), age.cast("double"))

    def _win(cond, val):
        return F.coalesce(F.sum(F.when(cond, val)), F.lit(0).cast("long"))

    bl_flags = [
        F.max(
            F.when(
                (F.col("cat") == "error")
                & (age <= 7)
                & F.array_contains("bls", F.lit(b)),
                1,
            ).otherwise(0)
        ).alias(f"bl_{b}")
        for b in range(10)
    ]
    ent = lvl.groupBy("entity").agg(
        _win(age <= 1, F.col("n")).alias("alerts_1d"),
        _win(age <= 1, F.col("c")).alias("conns_1d"),
        F.count_distinct(F.when(age <= 1, F.col("cat"))).alias("nodes_1d"),
        _win(age <= 7, F.col("n")).alias("alerts_7d"),
        _win(age <= 7, F.col("c")).alias("conns_7d"),
        F.count_distinct(F.when(age <= 7, F.col("cat"))).alias("nodes_7d"),
        F.round(F.coalesce(F.sum(F.when(age < 7, F.col("n") * w)), F.lit(0.0)), 6)
        .alias("alerts_ewma"),
        F.round(F.coalesce(F.sum(F.when(age < 7, F.col("c") * w)), F.lit(0.0)), 6)
        .alias("conns_ewma"),
        F.collect_set(F.when(age < 7, F.col("d"))).alias("_days7"),
        F.max("mts").alias("_last_ts"),
        F.first("as_of").alias("as_of"),
        *bl_flags,
    )
    # bin_ewma over *distinct* days present (fmp_updater.py:288: weight
    # counted once per day with any alert)
    day_w = lambda x: F.lit(EWMA_A) * F.pow(  # noqa: E731
        F.lit(EWMA_D), F.datediff(F.to_date("as_of"), x).cast("double")
    )
    ent = ent.withColumn(
        "binalerts_ewma",
        F.round(
            F.aggregate("_days7", F.lit(0.0), lambda acc, x: acc + day_w(x)), 6
        ),
    ).withColumn(
        "last_alert_age",
        F.round(
            (F.unix_micros("as_of") - F.unix_micros("_last_ts")) / 86400e6, 6
        ),
    )

    # Intervals between the last 21 events (:228-238; a13 pattern —
    # WindowGroupLimit bounds per-key state)
    w_desc = Window.partitionBy("entity").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    tss = F.sort_array(F.collect_list(F.unix_micros("ts")))
    iv = (
        base.withColumn("rn", F.row_number().over(w_desc))
        .filter(F.col("rn") <= 21)
        .groupBy("entity")
        .agg(tss.alias("tss"))
    )
    nts = F.size("tss")
    diffs = F.when(
        nts >= 2,
        F.transform(
            F.sequence(F.lit(2), nts),
            # F.get is 0-based: 1-based element i minus element i-1
            lambda i: F.get("tss", i - 1) - F.get("tss", i - 2),
        ),
    ).otherwise(F.array(F.lit(0).cast("long")))
    cnt = F.size("m")
    mid_hi = (cnt / F.lit(2)).cast("int")  # 1-based upper-middle index
    median_us = F.when(
        cnt % 2 == 1,
        F.get("m", ((cnt + 1) / F.lit(2)).cast("int") - 1).cast("double"),
    ).otherwise(
        (F.get("m", mid_hi - 1) + F.get("m", mid_hi)) / F.lit(2.0)
    )
    iv = iv.withColumn("m", F.sort_array(diffs)).select(
        "entity",
        F.round(
            F.aggregate("m", F.lit(0).cast("long"), lambda a, x: a + x)
            / (F.size("m") * F.lit(86400e6)),
            6,
        ).alias("intervals_avg"),
        F.round(median_us / 86400e6, 6).alias("intervals_med"),
    )

    # Prefix (/24) meta: same counts + distinct-entity counts, grouped
    # by shiftright(ip_int, 8) and joined back (J8, :292-355)
    plvl = lvl.withColumn("prefix", _prefix_of(F.col("entity")))
    pref = plvl.groupBy("prefix").agg(
        _win(age <= 1, F.col("n")).alias("prefix_alerts_1d"),
        _win(age <= 1, F.col("c")).alias("prefix_conns_1d"),
        F.count_distinct(F.when(age <= 1, F.col("entity"))).alias("prefix_ips_1d"),
        F.count_distinct(F.when(age <= 1, F.col("cat"))).alias("prefix_nodes_1d"),
        _win(age <= 7, F.col("n")).alias("prefix_alerts_7d"),
        _win(age <= 7, F.col("c")).alias("prefix_conns_7d"),
        F.count_distinct(F.when(age <= 7, F.col("entity"))).alias("prefix_ips_7d"),
        F.count_distinct(F.when(age <= 7, F.col("cat"))).alias("prefix_nodes_7d"),
        F.round(F.coalesce(F.sum(F.when(age < 7, F.col("n") * w)), F.lit(0.0)), 6)
        .alias("prefix_alerts_ewma"),
        F.round(F.coalesce(F.sum(F.when(age < 7, F.col("c") * w)), F.lit(0.0)), 6)
        .alias("prefix_conns_ewma"),
        F.collect_set(F.when(age < 7, F.col("d"))).alias("_pdays7"),
        F.first("as_of").alias("_pas_of"),
    )
    pday_w = lambda x: F.lit(EWMA_A) * F.pow(  # noqa: E731
        F.lit(EWMA_D), F.datediff(F.to_date("_pas_of"), x).cast("double")
    )
    pref = pref.withColumn(
        "prefix_binalerts_ewma",
        F.round(
            F.aggregate("_pdays7", F.lit(0.0), lambda acc, x: acc + pday_w(x)), 6
        ),
    ).drop("_pdays7", "_pas_of")

    # Hostname tags + geo from the customer/nation dims (broadcast).
    # "Hostname missing" analog: negative account balance (:474-504 —
    # missing hostname zeroes all four tag features).
    cust = customer.select(
        F.col("c_custkey").alias("entity"),
        "c_name",
        "c_acctbal",
        "c_mktsegment",
        "c_nationkey",
    ).join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("ctry"))),
        F.col("c_nationkey") == F.col("n_nationkey"),
        "left",
    )
    out = (
        ent.withColumn("prefix", _prefix_of(F.col("entity")))
        .join(pref, "prefix")
        .join(iv, "entity")
        .join(F.broadcast(cust), "entity", "left")
    )
    he = F.when(F.col("c_name").isNotNull() & (F.col("c_acctbal") >= 0), 1).otherwise(0)
    last_digit = F.right(F.col("c_name"), F.lit(1))
    out = (
        out.withColumn("hostname_exists", he)
        .withColumn(
            "dynamic_static",
            F.when(
                F.col("hostname_exists") == 1,
                F.when(last_digit.isin("1", "3", "5", "7", "9"), 1).otherwise(-1),
            ).otherwise(0),
        )
        .withColumn(
            "dsl",
            F.when(
                (F.col("hostname_exists") == 1)
                & F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "ip_in_hostname",
            F.when(
                (F.col("hostname_exists") == 1)
                & (F.left(F.right(F.col("c_name"), F.lit(2)), F.lit(1)) == last_digit),
                1,
            ).otherwise(0),
        )
        .withColumn("asn", F.col("entity") % 20)
    )

    # ctry badness: known scored entities / dim-total per country
    # (:161-178); asn badness likewise over entity%20 (:181-215).
    # The "known" counts need only the entity KEY universe + the
    # customer dim — aggregate those, not the full feature frame
    # (which would re-execute the whole join tree once per badness
    # aggregate; measured 3x the fmp_score runtime before this).
    keys = ent.select("entity")
    ctry_known = (
        keys.join(F.broadcast(cust.select("entity", "ctry")), "entity", "left")
        .filter(F.col("ctry").isNotNull())
        .groupBy("ctry")
        .agg(F.count("*").alias("_ck"))
    )
    ctry_total = cust.groupBy("ctry").agg(F.count("*").alias("_ct"))
    asn_known = keys.select((F.col("entity") % 20).alias("asn")).groupBy(
        "asn"
    ).agg(F.count("*").alias("_ak"))
    asn_total = (
        customer.select((F.col("c_custkey") % 20).alias("asn"))
        .groupBy("asn")
        .agg(F.count("*").alias("_at"))
    )
    out = (
        out.join(F.broadcast(ctry_known), "ctry", "left")
        .join(F.broadcast(ctry_total), "ctry", "left")
        .join(F.broadcast(asn_known), "asn", "left")
        .join(F.broadcast(asn_total), "asn", "left")
        .withColumn(
            "ctry_badness",
            F.when(
                F.col("ctry").isNotNull() & (F.col("_ct") > 0),
                F.round(F.col("_ck") / F.col("_ct"), 6),
            ).otherwise(0.0),
        )
        .withColumn(
            "asn_badness",
            F.when(
                F.col("_at") > 0, F.round(F.col("_ak") / F.col("_at"), 6)
            ).otherwise(0.0),
        )
    )
    return out.select("entity", *FEATURES)


# ---------------------------------------------------------------------------
# Scoring (Arrow-batched pandas UDF; XGBoost seam)
# ---------------------------------------------------------------------------


def _transform_np(x: pd.Series, kind: str) -> pd.Series:
    # ln(1+x) (not log1p) so the op sequence matches the SQL oracle
    # bit-for-bit; rounded to 6 before the dot product on both sides.
    if kind == "log1p":
        t = np.log(1.0 + x.astype("float64"))
    elif kind == "expneg":
        t = np.exp(-x.astype("float64"))
    elif kind == "expneg7":
        xf = x.astype("float64")
        t = np.where(xf > 7.0, 0.0, np.exp(-xf))
    else:
        t = x.astype("float64")
    return np.round(t, 6)


def _stub_score_fn(*cols: pd.Series) -> pd.Series:
    """Deterministic logistic stub standing in for model.predict —
    vectorized over Arrow batches like predict_batch_udf would be.
    Applies the reference's transform layout (log1p counts, exp(-x)
    ages, passthrough flags; fmp_updater.py:410,419,429,463)."""
    z = np.full(len(cols[0]), STUB_BIAS)
    for s, (_, kind, coef) in zip(cols, FEATURE_SPEC):
        z = z + coef * _transform_np(s, kind)
    return pd.Series(np.round(1.0 / (1.0 + np.exp(-z)), 6))


def score(features: DataFrame, predict=None) -> DataFrame:
    """Attach the fmp score via an Arrow-batched pandas UDF.

    ``predict(matrix: np.ndarray[rows, 34]) -> np.ndarray[rows]`` is
    the model seam: pass an XGBoost booster's predict (the reference
    model, fmp_updater.py:678-683) or any batch scorer; it receives
    the TRANSFORMED feature matrix in FEATURE_SPEC order, exactly what
    the reference feeds its DMatrix (:516-518). Default = the
    deterministic logistic stub so the math stays oracle-checkable.
    The UDF is built lazily — varargs pandas_udf needs an active
    session to parse its return type."""
    if predict is None:
        fn = _stub_score_fn
    else:

        def fn(*cols: pd.Series) -> pd.Series:
            mat = np.column_stack(
                [_transform_np(s, kind) for s, (_, kind, _) in zip(cols, FEATURE_SPEC)]
            )
            return pd.Series(np.asarray(predict(mat), dtype="float64"))

    udf = pandas_udf(fn, "double")
    return features.withColumn("fmp", udf(*[F.col(c) for c in FEATURES]))


def fmp_pipeline(
    events: DataFrame, customer: DataFrame, nation: DataFrame,
    entity: str = "user_id",
) -> DataFrame:
    return score(assemble_features(events, customer, nation, entity=entity))


def training_frame(
    events: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    entity: str = "user_id",
    horizon_hours: int = 24,
) -> DataFrame:
    """Feature vectors + future-misbehavior labels for retraining
    (reference: fmp_updater.py:527-575 logs features with whether the
    IP attacked in the last 24 h; here the label is *forward-looking*
    — features as of cutoff = max(ts) - horizon over pre-cutoff events
    only, label = any event after — a proper temporal split, which is
    stronger than the reference's same-window flag and documented as a
    deliberate divergence)."""
    cutoff = events.agg(
        (F.max("ts") - F.expr(f"INTERVAL {horizon_hours} HOURS")).alias("as_of")
    )
    past = (
        events.crossJoin(F.broadcast(cutoff))
        .filter(F.col("ts") <= F.col("as_of"))
        .drop("as_of")
    )
    feats = assemble_features(past, customer, nation, as_of=cutoff, entity=entity)
    future = (
        events.crossJoin(F.broadcast(cutoff))
        .filter(F.col("ts") > F.col("as_of"))
        .select(F.col(entity).alias("entity"))
        .distinct()
        .withColumn("label", F.lit(1))
    )
    return feats.join(future, "entity", "left").na.fill({"label": 0})


# ---------------------------------------------------------------------------
# Oracle SQL generation (DuckDB) — same FEATURE_SPEC drives both sides
# ---------------------------------------------------------------------------


def _transform_sql(col: str, kind: str) -> str:
    if kind == "log1p":
        return f"round(ln(1 + {col}), 6)"
    if kind == "expneg":
        return f"round(exp(-{col}), 6)"
    if kind == "expneg7":
        return f"round(CASE WHEN {col} > 7.0 THEN 0.0 ELSE exp(-{col}) END, 6)"
    return f"round(CAST({col} AS DOUBLE), 6)"


def fmp_oracle_sql(training: bool = False) -> str:
    """Full DuckDB mirror of assemble_features(+score | +label)."""
    # The age anchor must be the *cutoff* in training mode (features
    # are "as of" the cutoff, not as of the last pre-cutoff event) —
    # mirrors assemble_features(as_of=cutoff).
    if training:
        src = """
  cutoff AS (SELECT max(ts) - INTERVAL 24 HOUR AS co FROM events),
  src AS (SELECT e.* FROM events e, cutoff WHERE e.ts <= cutoff.co),
  anchor AS (SELECT co AS ao, CAST(co AS DATE) AS ad FROM cutoff),"""
    else:
        src = """
  src AS (SELECT * FROM events),
  anchor AS (SELECT max(ts) AS ao, CAST(max(ts) AS DATE) AS ad FROM src),"""
    age = "date_diff('day', d, ad)"
    ewma_w = f"0.25 * pow(0.75, {age})"
    bl_sql = ",\n      ".join(
        f"max(CASE WHEN cat = 'error' AND {age} <= 7 AND bl = {b}"
        f" THEN 1 ELSE 0 END) AS bl_{b}"
        for b in range(10)
    )
    wins = f"""
    CAST(coalesce(count(*) FILTER (WHERE {age} <= 1), 0) AS BIGINT) AS alerts_1d,
    CAST(coalesce(sum(conns) FILTER (WHERE {age} <= 1), 0) AS BIGINT) AS conns_1d,
    CAST(count(DISTINCT cat) FILTER (WHERE {age} <= 1) AS BIGINT) AS nodes_1d,
    CAST(coalesce(count(*) FILTER (WHERE {age} <= 7), 0) AS BIGINT) AS alerts_7d,
    CAST(coalesce(sum(conns) FILTER (WHERE {age} <= 7), 0) AS BIGINT) AS conns_7d,
    CAST(count(DISTINCT cat) FILTER (WHERE {age} <= 7) AS BIGINT) AS nodes_7d"""
    pwins = (
        wins.replace(" AS alerts", " AS prefix_alerts")
        .replace(" AS conns", " AS prefix_conns")
        .replace(" AS nodes", " AS prefix_nodes")
    )
    sql = f"""
WITH {src}
  base AS (
    SELECT user_id AS entity, CAST(ts AS DATE) AS d, event_type AS cat, ts,
           event_id, CAST(floor(value) AS BIGINT) AS conns,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS bl,
           (167772160 + user_id * 97) // 256 AS prefix
    FROM src
  ),
  ent AS (
    SELECT entity, {wins},
      {bl_sql},
      round((epoch_us(any_value(ao)) - epoch_us(max(ts))) / 86400e6, 6) AS last_alert_age
    FROM base, anchor GROUP BY 1
  ),
  pd AS (SELECT entity, d, count(*) AS nd, sum(conns) AS cd FROM base GROUP BY 1, 2),
  ew AS (
    SELECT entity,
      round(coalesce(sum(nd * {ewma_w}) FILTER (WHERE {age} < 7), 0), 6) AS alerts_ewma,
      round(coalesce(sum(cd * {ewma_w}) FILTER (WHERE {age} < 7), 0), 6) AS conns_ewma,
      round(coalesce(sum({ewma_w}) FILTER (WHERE {age} < 7), 0), 6) AS binalerts_ewma
    FROM pd, anchor GROUP BY 1
  ),
  ppd AS (SELECT prefix, d, count(*) AS nd, sum(conns) AS cd FROM base GROUP BY 1, 2),
  pew AS (
    SELECT prefix,
      round(coalesce(sum(nd * {ewma_w}) FILTER (WHERE {age} < 7), 0), 6) AS prefix_alerts_ewma,
      round(coalesce(sum(cd * {ewma_w}) FILTER (WHERE {age} < 7), 0), 6) AS prefix_conns_ewma,
      round(coalesce(sum({ewma_w}) FILTER (WHERE {age} < 7), 0), 6) AS prefix_binalerts_ewma
    FROM ppd, anchor GROUP BY 1
  ),
  pref AS (
    SELECT prefix, {pwins},
      CAST(count(DISTINCT entity) FILTER (WHERE {age} <= 1) AS BIGINT) AS prefix_ips_1d,
      CAST(count(DISTINCT entity) FILTER (WHERE {age} <= 7) AS BIGINT) AS prefix_ips_7d
    FROM base, anchor GROUP BY 1
  ),
  l21 AS (
    SELECT entity, ts, event_id,
           row_number() OVER (PARTITION BY entity ORDER BY ts DESC, event_id DESC) AS rn
    FROM base
  ),
  kept AS (
    SELECT entity, ts,
           lag(ts) OVER (PARTITION BY entity ORDER BY ts, event_id) AS prev_ts
    FROM l21 WHERE rn <= 21
  ),
  ivl AS (
    SELECT entity,
           CASE WHEN count(prev_ts) = 0 THEN [CAST(0 AS BIGINT)]
                ELSE list_sort(list(epoch_us(ts) - epoch_us(prev_ts))
                               FILTER (WHERE prev_ts IS NOT NULL)) END AS m
    FROM kept GROUP BY 1
  ),
  iv AS (
    SELECT entity,
      round(list_sum(m) / (len(m) * 86400e6), 6) AS intervals_avg,
      round((CASE WHEN len(m) % 2 = 1 THEN CAST(m[(len(m) + 1) // 2] AS DOUBLE)
                  ELSE (m[len(m) // 2] + m[len(m) // 2 + 1]) / 2.0 END)
            / 86400e6, 6) AS intervals_med
    FROM ivl
  ),
  cust AS (
    SELECT c_custkey AS entity, c_name, c_acctbal, c_mktsegment, n_name AS ctry
    FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
  ),
  tagged AS (
    SELECT e.entity,
      CASE WHEN c.c_name IS NOT NULL AND c.c_acctbal >= 0 THEN 1 ELSE 0 END AS hostname_exists,
      c.c_name, c.c_mktsegment, c.ctry, e.entity % 20 AS asn
    FROM ent e LEFT JOIN cust c USING (entity)
  ),
  tags AS (
    SELECT entity, hostname_exists,
      CASE WHEN hostname_exists = 1 THEN
        (CASE WHEN right(c_name, 1) IN ('1','3','5','7','9') THEN 1 ELSE -1 END)
      ELSE 0 END AS dynamic_static,
      CASE WHEN hostname_exists = 1 AND c_mktsegment IN ('BUILDING','AUTOMOBILE')
           THEN 1 ELSE 0 END AS dsl,
      CASE WHEN hostname_exists = 1 AND left(right(c_name, 2), 1) = right(c_name, 1)
           THEN 1 ELSE 0 END AS ip_in_hostname,
      ctry, asn
    FROM tagged
  ),
  ctry_known AS (SELECT ctry, count(*) AS ck FROM tags WHERE ctry IS NOT NULL GROUP BY 1),
  ctry_total AS (
    SELECT n_name AS ctry, count(*) AS ct
    FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY 1
  ),
  asn_known AS (SELECT asn, count(*) AS ak FROM tags GROUP BY 1),
  asn_total AS (SELECT c_custkey % 20 AS asn, count(*) AS at_ FROM customer GROUP BY 1),
  feat AS (
    SELECT e.entity,
      e.alerts_1d, e.conns_1d, e.nodes_1d, e.alerts_7d, e.conns_7d, e.nodes_7d,
      w.alerts_ewma, w.conns_ewma, w.binalerts_ewma,
      e.last_alert_age, i.intervals_avg, i.intervals_med,
      p.prefix_alerts_1d, p.prefix_conns_1d, p.prefix_ips_1d, p.prefix_nodes_1d,
      p.prefix_alerts_7d, p.prefix_conns_7d, p.prefix_ips_7d, p.prefix_nodes_7d,
      pw.prefix_alerts_ewma, pw.prefix_conns_ewma, pw.prefix_binalerts_ewma,
      {", ".join(f"e.bl_{b}" for b in range(10))},
      t.hostname_exists, t.dynamic_static, t.dsl, t.ip_in_hostname,
      CASE WHEN t.ctry IS NOT NULL AND ctt.ct > 0
           THEN round(ctk.ck * 1.0 / ctt.ct, 6) ELSE 0.0 END AS ctry_badness,
      CASE WHEN att.at_ > 0 THEN round(ak.ak * 1.0 / att.at_, 6) ELSE 0.0 END AS asn_badness
    FROM ent e
    JOIN ew w USING (entity)
    JOIN iv i USING (entity)
    JOIN pref p ON p.prefix = (167772160 + e.entity * 97) // 256
    JOIN pew pw ON pw.prefix = (167772160 + e.entity * 97) // 256
    JOIN tags t USING (entity)
    LEFT JOIN ctry_known ctk ON ctk.ctry = t.ctry
    LEFT JOIN ctry_total ctt ON ctt.ctry = t.ctry
    LEFT JOIN asn_known ak ON ak.asn = t.asn
    LEFT JOIN asn_total att ON att.asn = t.asn
  )"""
    feat_cols = ", ".join(FEATURES)
    if training:
        return f"""{sql},
  future AS (
    SELECT DISTINCT user_id AS entity FROM events, cutoff WHERE ts > cutoff.co
  )
  SELECT f.entity AS user_id, {feat_cols},
         CAST(CASE WHEN fu.entity IS NOT NULL THEN 1 ELSE 0 END AS INT) AS label
  FROM feat f LEFT JOIN future fu USING (entity)"""
    z = " + ".join(
        f"{coef} * {_transform_sql(name, kind)}" for name, kind, coef in FEATURE_SPEC
    )
    return f"""{sql}
  SELECT entity AS user_id, {feat_cols},
         round(1.0 / (1.0 + exp(-({STUB_BIAS} + {z}))), 6) AS fmp
  FROM feat"""
