"""Config-driven multi-source reputation (SURVEY §2.5 A6/A7).

The reference computes one partial reputation per enabled source
module (`_rep_warden`, `_rep_dshield`, `_rep_blacklists`, `_rep_otx`,
`_rep_misp`), each parameterized from `etc/reputation.yml` (scales,
coefficients, date range, time decay, trust factor), then combines
them with the probabilistic OR `rep = 1 - prod(1 - r_src * trust_src)`
(reference: NERDd/modules/reputation.py:40-51 config load, :90-136
per-source math, :100-109 combination; etc/reputation.yml:24-61).

Here each source is a *daily extractor* producing
``(entity, d, num_events [, num_detectors])`` and the shared
:func:`partial_reputation` applies the decay-weighted mean of
``nonlin(num_events) * nonlin(num_detectors)`` — pure column math,
one groupBy per source. The day-weight denominator spans every day of
the range whether or not data exists (zero days contribute
nonlin(0)=0 to the numerator), exactly as the reference loop does.

Scale shape: all extractors derive from ONE (entity, day, cat) rollup
of the event scan, so Catalyst reuses a single shuffle exchange
across the per-source branches; the final combine is one union +
group-by on the already-aggregated (tiny) per-entity frames.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# nonlin with the reference's exact saturation cap
# ---------------------------------------------------------------------------


def nonlin_capped(v: Column, scale: float, coef: float = 0.5, cap: float = 20.0) -> Column:
    """1 - coef^(v/scale), exactly 1.0 once v/scale > cap
    (reference: NERDd/modules/reputation.py:16-21 — the `max=20`
    early-out returns a literal 1.0, not the asymptote)."""
    vs = F.coalesce(v.cast("double"), F.lit(0.0)) / F.lit(float(scale))
    return F.when(vs > cap, F.lit(1.0)).otherwise(
        F.lit(1.0) - F.pow(F.lit(float(coef)), vs)
    )


def nonlin_capped_sql(v: str, scale: float, coef: float = 0.5, cap: float = 20.0) -> str:
    """DuckDB rendering of nonlin_capped — keep in lockstep."""
    vs = f"(({v}) * 1.0 / {scale})"
    return (
        f"CASE WHEN {vs} > {cap} THEN 1.0 ELSE 1.0 - pow({coef}, {vs}) END"
    )


# ---------------------------------------------------------------------------
# Per-source parameters (reputation.yml shape)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SourceParams:
    """One `rep_params.<module>` block of etc/reputation.yml:14-61."""

    scale_events: float = 1.0
    scale_detectors: float = 1.0
    coef_events: float = 0.5
    coef_detectors: float = 0.5
    trust_factor: float = 1.0
    date_range: int = 30
    time_decay: str = "none"  # none | linear | half_life
    half_life: float = 1.0
    has_detectors: bool = False  # extractor provides num_detectors

    def weight(self, age: Column) -> Column:
        a = age.cast("double")
        if self.time_decay == "linear":
            return (F.lit(float(self.date_range)) - a) / float(self.date_range)
        if self.time_decay == "half_life":
            return F.pow(F.lit(0.5), a / F.lit(self.half_life))
        return F.lit(1.0)

    def weight_denominator(self) -> float:
        """sum of weights over the full date range — constant,
        independent of which days have data (reference loop
        reputation.py:120-133 accumulates sum_weight for every d)."""
        r = self.date_range
        if self.time_decay == "linear":
            return sum((r - d) / r for d in range(r))
        if self.time_decay == "half_life":
            return sum(0.5 ** (d / self.half_life) for d in range(r))
        return float(r)


#: reputation.yml-shaped default catalogue (etc/reputation.yml:24-61).
DEFAULT_REP_CONFIG: dict[str, SourceParams] = {
    "warden": SourceParams(
        scale_events=10, scale_detectors=2, date_range=14,
        time_decay="linear", has_detectors=True,
    ),
    "blacklists": SourceParams(scale_events=20, date_range=1, time_decay="none"),
    "dshield": SourceParams(
        scale_events=200, scale_detectors=100, trust_factor=0.5,
        date_range=14, time_decay="linear", has_detectors=True,
    ),
    "otx": SourceParams(scale_events=1, date_range=30, time_decay="linear"),
    "misp": SourceParams(scale_events=5, date_range=1, time_decay="none"),
}

#: Severity per blacklist id for the evidence-point sum
#: (reference: reputation.py:70-73 — severity read from the
#: blacklist config files; get_blacklists_data :179-197).
BL_SEVERITY: dict[int, int] = {0: 1, 1: 2, 2: 3, 3: 5, 4: 8}


# ---------------------------------------------------------------------------
# Generic partial reputation over a daily extractor frame
# ---------------------------------------------------------------------------


def partial_reputation(
    daily: DataFrame,
    as_of: DataFrame,
    p: SourceParams,
    out: str = "rep",
    events_col: str = "num_events",
    detectors_col: str = "num_detectors",
) -> DataFrame:
    """Decay-weighted mean of daily nonlin scores → (entity, <out>).

    `daily` = (entity, d, num_events[, num_detectors]); `as_of` a
    broadcast single-row frame with column ``as_of``. Mirrors
    reference reputation.py:111-136: days outside date_range are
    skipped, the weight denominator covers the whole range, the
    detectors factor applies only when the source provides one.
    """
    df = daily.crossJoin(F.broadcast(as_of))
    age = F.datediff(F.to_date("as_of"), F.col("d"))
    df = df.filter(age < p.date_range)
    daily_rep = nonlin_capped(F.col(events_col), p.scale_events, p.coef_events)
    if p.has_detectors:
        daily_rep = daily_rep * nonlin_capped(
            F.col(detectors_col), p.scale_detectors, p.coef_detectors
        )
    w = p.weight(age)
    denom = p.weight_denominator()
    return df.groupBy("entity").agg(
        F.round(F.sum(daily_rep * w) / F.lit(denom), 6).alias(out)
    )


def combine_total(
    parts: list[tuple[DataFrame, str, float]], out: str = "rep"
) -> DataFrame:
    """rep = 1 - prod(1 - rep_src * trust_src), missing source → 0
    (reference: reputation.py:100-109). Implemented as union +
    conditional agg: one shuffle over already-tiny per-entity frames,
    no N-way outer-join chain."""
    unioned = None
    for df, name, _trust in parts:
        tagged = df.select(
            "entity", F.lit(name).alias("src"), F.col(df.columns[1]).alias("r")
        )
        unioned = tagged if unioned is None else unioned.unionByName(tagged)
    factors = []
    for _df, name, trust in parts:
        r = F.coalesce(F.max(F.when(F.col("src") == name, F.col("r"))), F.lit(0.0))
        factors.append(F.lit(1.0) - r * F.lit(float(trust)))
    prod = factors[0]
    for f_ in factors[1:]:
        prod = prod * f_
    return unioned.groupBy("entity").agg(
        F.round(F.lit(1.0) - prod, 6).alias(out)
    )


# ---------------------------------------------------------------------------
# Source extractors over the synthetic `events` table
# ---------------------------------------------------------------------------
#
# Mapping of the reference's five feeds onto the driver's synthetic
# events(user_id, ts, event_type, value, props) table — deterministic
# and documented so the oracle SQL can mirror it exactly:
#
#   warden      all events;       num_events=count, detectors=#event_type
#   dshield     'purchase' rows;  reports=sum(floor(value)), targets=count
#   blacklists  'error' rows;     bl id = props.k % 5, evidence points =
#                                 sum of BL_SEVERITY over the day's distinct ids
#   otx         'click' rows;     pulses/day = count
#   misp        'signup' rows;    ALL events counted as today
#                                 (reference get_misp_data :213-221)


def base_daily(events: DataFrame) -> DataFrame:
    """The single shared (entity, day, cat) rollup every extractor
    derives from — one scan, one shuffle, exchange reused across
    branches."""
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy(
        F.col("user_id").alias("entity"),
        F.to_date("ts").alias("d"),
        F.col("event_type").alias("cat"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.floor("value")).alias("fv"),
        F.collect_set(k % 5).alias("ks"),
    )


def warden_daily(daily: DataFrame) -> DataFrame:
    return daily.groupBy("entity", "d").agg(
        F.sum("n").alias("num_events"),
        F.count_distinct("cat").alias("num_detectors"),
    )


def dshield_daily(daily: DataFrame) -> DataFrame:
    return daily.filter(F.col("cat") == "purchase").select(
        "entity", "d",
        F.col("fv").alias("num_events"),
        F.col("n").alias("num_detectors"),
    )


def blacklists_daily(daily: DataFrame) -> DataFrame:
    """Evidence points = Σ severity over the day's distinct blacklist
    ids (reference: get_blacklists_data reputation.py:179-197; the
    reference's `for d in evidence_points` indexing slip is NOT
    reproduced — it is masked there by date_range=1 anyway)."""
    sev_map = F.create_map(
        *[F.lit(v) for kv in sorted(BL_SEVERITY.items()) for v in kv]
    )
    points = F.aggregate(
        "ks",
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.coalesce(F.try_element_at(sev_map, x.cast("int")), F.lit(0)).cast("long"),
    )
    return daily.filter(F.col("cat") == "error").select(
        "entity", "d", points.alias("num_events")
    )


def otx_daily(daily: DataFrame) -> DataFrame:
    return daily.filter(F.col("cat") == "click").select(
        "entity", "d", F.col("n").alias("num_events")
    )


def misp_daily(daily: DataFrame, as_of: DataFrame) -> DataFrame:
    """All MISP events count as published today (age 0), regardless of
    their own date (reference: get_misp_data reputation.py:213-221)."""
    total = daily.filter(F.col("cat") == "signup").groupBy("entity").agg(
        F.sum("n").alias("num_events")
    )
    return total.crossJoin(F.broadcast(as_of)).select(
        "entity", F.to_date("as_of").alias("d"), "num_events"
    )
