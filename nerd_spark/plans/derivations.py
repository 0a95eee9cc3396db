"""Derivation pipeline stages (SURVEY §2.5, §3.1 stage 8).

The reference's handler DAG (event_counter → event_type_counter →
reputation → threat summary → tags) fires per-record at update time
(reference: NERDd/core/update_manager.py:530-760). Here the DAG is
flattened into deterministic dataset-level stages: each stage is a
pure DataFrame -> DataFrame function over the generic daily-fact
schema, so Catalyst sees one declarative plan per derivation pass.

Generic daily-fact schema (the normalized form of the per-record
`events` array, reference: NERDd/warden_receiver.py:555-575):

    entity    long/string   the entity key (NERD: ip_int)
    d         date          event day
    cat       string        category (NERD: event category / node)
    n         long          event count
    val       double        additive measure (NERD: conns)

All age math is relative to an explicit ``as_of`` (the reference
hardcodes utcnow(), e.g. event_counter.py:77 — injected here for
determinism, SURVEY §7 risk note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nerd_spark.functions.mathx import nonlin, prob_or


def daily_rollup(
    events: DataFrame,
    entity: str,
    ts: str = "ts",
    cat: str = "event_type",
    val: str = "value",
) -> DataFrame:
    """A1: per-(entity, day, category) base fact rollup
    (reference: NERDd/warden_receiver.py:534-563 array_upsert of
    {date, node, cat} += n/conns). One shuffle, map-side partial agg.
    """
    # The additive measure accumulates in DECIMAL: exact, order-
    # independent — double sums differ run-to-run with partition order.
    return events.groupBy(
        F.col(entity).alias("entity"),
        F.to_date(ts).alias("d"),
        F.col(cat).alias("cat"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col(val), 4).cast("decimal(18,4)")).alias("val_dec"),
    )


def with_as_of(daily: DataFrame, as_of: DataFrame) -> DataFrame:
    """Attach a broadcast single-row as_of frame (col ``as_of`` ts)."""
    return daily.crossJoin(F.broadcast(as_of))


def _age() -> Column:
    return F.datediff(F.to_date("as_of"), F.col("d"))


def window_totals(daily_with_asof: DataFrame, windows=(1, 7, 30)) -> DataFrame:
    """A2: windowed totals + distinct categories per window
    (reference: NERDd/modules/event_counter.py:52-116 — note NERD's
    'total1' is today+yesterday bucket arithmetic, i.e. age<=1, not a
    sliding 24 h; reproduced here).
    """
    age = _age()
    aggs = [F.sum("n").alias("total")]
    for w in windows:
        aggs.append(F.sum(F.when(age <= w, F.col("n")).otherwise(0)).alias(f"total{w}"))
        aggs.append(
            F.count_distinct(F.when(age <= w, F.col("cat"))).alias(f"cats_{w}d")
        )
    return daily_with_asof.groupBy("entity").agg(*aggs)


def ewma(daily_with_asof: DataFrame, days: int = 7, alpha=0.25, decay=0.75) -> DataFrame:
    """A3: EWMA + binary EWMA over the last `days` daily buckets
    (reference: event_counter.py:12-13,104-115 — weights
    alpha*decay^age, age 0..6).

    ONE shuffle: the window is a bounded handful of ages, so the
    per-day pre-aggregation unrolls into `days` conditional sums
    inside a single per-entity groupBy — ewma = Σₐ wₐ·ndₐ, bin_ewma =
    Σₐ wₐ·presentₐ — instead of the former (entity, d) rollup followed
    by a second per-entity shuffle. The weight terms α·decayᵃ are
    dyadic rationals (0.25·0.75ᵃ) so the unrolled fixed-order sum is
    bit-identical to the grouped formulation.
    """
    age = _age()
    terms_e, terms_b = [], []
    for a in range(days):
        w = float(alpha) * float(decay) ** a
        nd_a = F.sum(F.when(age == a, F.col("n")).otherwise(0))
        present_a = F.max(F.when(age == a, 1).otherwise(0))
        terms_e.append(nd_a * F.lit(w))
        terms_b.append(present_a * F.lit(w))
    return daily_with_asof.groupBy("entity").agg(
        F.round(sum(terms_e[1:], terms_e[0]), 6).alias("ewma"),
        F.round(sum(terms_b[1:], terms_b[0]), 6).alias("bin_ewma"),
    )


def type_profile(
    daily_with_asof: DataFrame, window: int = 30, min_share=0.05, min_total=10
) -> DataFrame:
    """A5: event-type profile — categories holding ≥ min_share of the
    window total, only when total ≥ min_total (reference:
    NERDd/modules/event_type_counter.py:41-104). Exploded rows
    (entity, cat, share) rather than a list column.
    """
    age = _age()
    in_win = daily_with_asof.filter(age <= window)
    per_cat = in_win.groupBy("entity", "cat").agg(F.sum("n").alias("n_cat"))
    per_ent = in_win.groupBy("entity").agg(F.sum("n").alias("n_tot"))
    return (
        per_cat.join(per_ent, "entity")
        .filter(
            (F.col("n_tot") >= min_total)
            & (F.col("n_cat") / F.col("n_tot") >= min_share)
        )
        .select(
            "entity",
            "cat",
            F.round(F.col("n_cat") / F.col("n_tot"), 6).alias("share"),
        )
    )


def source_reputation(
    daily_with_asof: DataFrame,
    days: int = 14,
    scale_events: float = 5.0,
    scale_cats: float = 2.0,
    out: str = "rep",
) -> DataFrame:
    """A6: per-source reputation — daily rep = nonlin(events) *
    nonlin(#detectors), weighted mean with linear decay over the
    window (reference: NERDd/modules/reputation.py:111-221; params
    etc/reputation.yml:24-61). Weight denominator spans all `days`
    ages, so missing days pull the mean down — as in the reference.
    """
    age = _age()
    # cats/day counts ROWS, not distinct cats: the input is the
    # (entity, d, cat)-grain daily rollup, where cat is unique within
    # a day by construction — a count_distinct here planned Spark's
    # expand + double-shuffle distinct aggregation, measured 4x the
    # whole query at the 80x point.
    per_day = (
        daily_with_asof.filter(age < days)
        .groupBy("entity", "d")
        .agg(
            F.sum("n").alias("nd"),
            F.count("cat").alias("cats"),
            F.first("as_of").alias("as_of"),
        )
    )
    age2 = F.datediff(F.to_date("as_of"), F.col("d"))
    w = (F.lit(days) - age2.cast("double")) / F.lit(days)
    rep_d = nonlin(F.col("nd"), scale=scale_events) * nonlin(
        F.col("cats"), scale=scale_cats
    )
    denom = sum((days - a) / days for a in range(days))
    return per_day.groupBy("entity").agg(
        F.round(F.sum(rep_d * w) / F.lit(denom), 6).alias(out)
    )


def total_reputation(parts: DataFrame, rep_trust: dict[str, float], out="rep") -> DataFrame:
    """A7: rep = 1 - prod(1 - rep_src * trust_src) over per-source
    columns (reference: reputation.py:100-109)."""
    cols = [F.col(c) * F.lit(t) for c, t in rep_trust.items()]
    return parts.select("entity", F.round(prob_or(cols), 6).alias(out))


def vector_reputation_columns(days: int = 14) -> dict[str, Column]:
    """Default-config reputation as row-local expressions over the
    window table's stored per-age daily vectors (nd_days, cats_days,
    err_days) — the two pseudo-sources the A7 combination uses.

    Computed at MAINTENANCE time and stored on the row (the reference
    likewise stores rep.* on the entity record, reputation.py:111-221
    via the update handler), so the a6/a7 serve paths become pure
    column reads instead of 28 pow() calls per entity per query.
    Config-altered deployments (other scales/windows — the
    reputationq.py family) compute their variant at query time from
    the same vectors.
    """
    denom = sum((days - a) / days for a in range(days))
    ev_terms = [
        nonlin(F.col("nd_days")[a], scale=5.0)
        * nonlin(F.col("cats_days")[a], scale=2.0)
        * F.lit((days - a) / days)
        for a in range(days)
    ]
    err_terms = [
        F.when(
            F.col("err_days")[a] > 0,
            nonlin(F.col("err_days")[a], 2.0)
            * nonlin(F.lit(1), 2.0)
            * F.lit((days - a) / days),
        ).otherwise(0.0)
        for a in range(days)
    ]
    return {
        "rep_events": F.round(sum(ev_terms[1:], ev_terms[0]) / F.lit(denom), 6),
        "rep_err": F.round(sum(err_terms[1:], err_terms[0]) / F.lit(denom), 6),
    }
