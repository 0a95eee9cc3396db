"""FMP batch scoring: feature assembly + vectorized model scoring.

The reference pulls the whole `ip` collection into one pandas frame
daily, assembles 39 features per record (event-window stats, EWMA,
/24-prefix aggregates, blacklist/geo features) and scores an XGBoost
model row by row (reference: NERDd/fmp_updater.py:577-646 extract,
:241-355 feature blocks, :357-525 assembly, :678-683 model load).
That driver-side pandas pass is the reference's scalability cliff
(SURVEY §3.3).

Spark shape: features are the derivation stages (distributed aggs +
the prefix join-back J8); scoring is an Arrow-batched pandas UDF.
A real XGBoost model plugs in behind the import-try; the default is
a deterministic logistic stub so the pipeline is testable (and
oracle-checkable — the stub is pure math).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from nerd_spark.plans import derivations as D

try:  # real model path, absent in this environment
    import xgboost  # noqa: F401

    HAVE_XGBOOST = True
except Exception:  # pragma: no cover
    HAVE_XGBOOST = False

# Stub model coefficients: logistic over the assembled features.
STUB_COEF = {
    "total7": 0.02,
    "ewma": 0.5,
    "bin_ewma": 1.0,
    "prefix_total7": 0.005,
    "prefix_entities": -0.05,
}
STUB_BIAS = -2.0

FEATURES = list(STUB_COEF)


def assemble_features(
    events: DataFrame,
    entity: str = "user_id",
    prefix_div: int = 5,
    as_of: DataFrame | None = None,
) -> DataFrame:
    """Per-entity feature frame: window totals + EWMA + prefix-group
    aggregates joined back (the J8 shape, fmp_updater.py:292-355).
    as_of: optional single-row frame (col ``as_of``) — pass the label
    cutoff when building training frames."""
    if as_of is None:
        as_of = events.agg(F.max("ts").alias("as_of"))
    daily = D.with_as_of(D.daily_rollup(events, entity), as_of)
    totals = D.window_totals(daily, windows=(7,)).select("entity", "total7")
    ewma = D.ewma(daily)
    base = totals.join(ewma, "entity", "left").na.fill(0.0)
    prefix = base.withColumn("prefix", (F.col("entity") / prefix_div).cast("long"))
    pref_agg = prefix.groupBy("prefix").agg(
        F.sum("total7").alias("prefix_total7"),
        F.count("*").alias("prefix_entities"),
    )
    return prefix.join(pref_agg, "prefix").select(
        "entity", "total7", "ewma", "bin_ewma", "prefix_total7", "prefix_entities"
    )


@pandas_udf("double")
def _stub_score(total7: pd.Series, ewma: pd.Series, bin_ewma: pd.Series,
                prefix_total7: pd.Series, prefix_entities: pd.Series) -> pd.Series:
    """Deterministic logistic stub standing in for model.predict —
    vectorized over Arrow batches like predict_batch_udf would be."""
    z = (
        STUB_BIAS
        + STUB_COEF["total7"] * total7
        + STUB_COEF["ewma"] * ewma
        + STUB_COEF["bin_ewma"] * bin_ewma
        + STUB_COEF["prefix_total7"] * prefix_total7
        + STUB_COEF["prefix_entities"] * prefix_entities
    )
    return 1.0 / (1.0 + (-z).apply(math.exp))


def score(features: DataFrame) -> DataFrame:
    """Attach the fmp score. Swap _stub_score for a broadcast XGBoost
    predict_batch_udf in a real deployment (HAVE_XGBOOST)."""
    return features.withColumn(
        "fmp", F.round(_stub_score(*[F.col(c) for c in FEATURES]), 6)
    )


def fmp_pipeline(events: DataFrame, entity: str = "user_id") -> DataFrame:
    return score(assemble_features(events, entity))


def training_frame(events: DataFrame, entity: str = "user_id", horizon_hours: int = 24) -> DataFrame:
    """Feature vectors + future-misbehavior labels for retraining
    (reference: fmp_updater.py:527-575 — logs each record's features
    with whether it attacked in the following 24 h).

    Features are computed as of cutoff = max(ts) - horizon using only
    events before the cutoff; label = entity had any event after it.
    """
    cutoff = events.agg(
        (F.max("ts") - F.expr(f"INTERVAL {horizon_hours} HOURS")).alias("as_of")
    )
    past = events.crossJoin(F.broadcast(cutoff)).filter(
        F.col("ts") <= F.col("as_of")
    ).drop("as_of")
    feats = assemble_features(past, entity, as_of=cutoff)
    future = (
        events.crossJoin(F.broadcast(cutoff))
        .filter(F.col("ts") > F.col("as_of"))
        .select(F.col(entity).alias("entity"))
        .distinct()
        .withColumn("label", F.lit(1))
    )
    return feats.join(future, "entity", "left").na.fill({"label": 0})
