"""Distributed logistic-regression training for the FMP model seam.

The reference trains an XGBoost classifier driver-side on the logged
feature frame and scores records with booster.predict (reference:
NERDd/fmp_updater.py:527-575 feature/label logging, :654-683 predict).
XGBoost is absent from this environment; this module closes the same
train -> score loop with a logistic regression whose every training
step is a Spark aggregation — feature rows never reach the driver:

- transform: the FEATURE_SPEC transforms (ln(1+x) / exp(-x) /
  identity, rounded to 6 like the scoring UDF and the SQL oracle) as
  JVM columns;
- standardize: one aggregation pass for per-feature mean/std;
- batch gradient descent: each iteration is ONE aggregation job that
  computes the full-batch gradient — avg over rows of
  (sigmoid(w·x) − y) · x_j for all features plus the bias — against
  the cached transformed frame. Driver state is the weight vector
  (35 floats), nothing else.

The fitted model plugs into :func:`nerd_spark.ml.fmp.score` through
the same ``predict(matrix)`` seam an XGBoost booster would use.

Scale: n_iter scans of the cached frame, each a map + tree-aggregate
with a 40-value result; at 10^8 entities × 39 features that is the
textbook full-batch LR on Spark (MLlib's LogisticRegression does the
same shape of work per iteration — not imported here to keep the
engine dependency-light and the math transparent).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nerd_spark.ml.fmp import FEATURE_SPEC, FEATURES


def _transform_col(name: str, kind: str):
    c = F.col(name).cast("double")
    if kind == "log1p":
        return F.round(F.log(F.lit(1.0) + c), 6)
    if kind == "expneg":
        return F.round(F.exp(-c), 6)
    if kind == "expneg7":
        return F.round(F.when(c > 7.0, F.lit(0.0)).otherwise(F.exp(-c)), 6)
    return F.round(c, 6)


@dataclass
class LogisticModel:
    """Fitted weights in standardized-transformed space.

    ``predict`` consumes the TRANSFORMED feature matrix in
    FEATURE_SPEC order — exactly what score()'s seam feeds an XGBoost
    DMatrix (fmp_updater.py:516-518) — and standardizes internally.
    """

    mean: np.ndarray
    std: np.ndarray
    weights: np.ndarray
    bias: float

    def predict(self, mat: np.ndarray) -> np.ndarray:
        z = ((np.asarray(mat, dtype="float64") - self.mean) / self.std) @ (
            self.weights
        ) + self.bias
        return 1.0 / (1.0 + np.exp(-z))


def fit_logistic(
    frame: DataFrame,
    label_col: str = "label",
    n_iter: int = 60,
    lr: float = 2.0,
    l2: float = 1e-4,
) -> LogisticModel:
    """Fit by full-batch gradient descent, one Spark agg per step."""
    t = frame.select(
        F.col(label_col).cast("double").alias("y"),
        *[_transform_col(n, k).alias(n) for n, k, _ in FEATURE_SPEC],
    ).cache()
    try:
        stats = t.agg(
            *[F.avg(n).alias(f"m_{n}") for n in FEATURES],
            *[F.stddev_pop(n).alias(f"s_{n}") for n in FEATURES],
        ).collect()[0]
        mu = np.array([stats[f"m_{n}"] or 0.0 for n in FEATURES])
        sd = np.array([stats[f"s_{n}"] or 0.0 for n in FEATURES])
        sd = np.where(sd < 1e-12, 1.0, sd)  # constant cols contribute 0

        d = len(FEATURES)
        w = np.zeros(d)
        b = 0.0
        xs = [
            ((F.col(n) - float(mu[j])) / float(sd[j])).alias(n)
            for j, n in enumerate(FEATURES)
        ]
        for _ in range(n_iter):
            z = F.lit(float(b))
            for j, n in enumerate(FEATURES):
                if w[j] != 0.0:
                    z = z + float(w[j]) * xs[j]
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            err = p - F.col("y")
            g = t.agg(
                F.avg(err).alias("g_b"),
                *[F.avg(err * xs[j]).alias(f"g_{j}") for j in range(d)],
            ).collect()[0]
            grad = np.array([g[f"g_{j}"] for j in range(d)]) + l2 * w
            w = w - lr * grad
            b = b - lr * g["g_b"]
        return LogisticModel(mean=mu, std=sd, weights=w, bias=float(b))
    finally:
        t.unpersist()


def auc(scored: DataFrame, score_col: str = "fmp", label_col: str = "label") -> float:
    """Rank-based AUC (Mann-Whitney), computed as aggregations.

    AUC = (sum of positive ranks − n_pos(n_pos+1)/2) / (n_pos·n_neg),
    ranks from a global sort on the score — an evaluation-time metric
    over one scalar column, not a hot path (ties get average rank via
    rank over distinct scores; at 100 TB use a sampled or binned
    estimate instead of the exact global sort).
    """
    from pyspark.sql import Window

    s = scored.select(
        F.col(score_col).alias("s"), F.col(label_col).cast("int").alias("y")
    )
    # average rank for ties: avg of row_numbers within a score group ==
    # (first + last)/2, computed from cumulative counts over the sort
    byscore = (
        s.groupBy("s")
        .agg(F.count("*").alias("c"), F.sum("y").alias("pos"))
        .withColumn(
            "cum", F.sum("c").over(Window.orderBy("s").rowsBetween(
                Window.unboundedPreceding, 0))
        )
        .withColumn("avg_rank", F.col("cum") - (F.col("c") - 1) / 2.0)
    )
    agg = byscore.agg(
        F.sum(F.col("avg_rank") * F.col("pos")).alias("rank_pos"),
        F.sum("pos").alias("n_pos"),
        F.sum(F.col("c") - F.col("pos")).alias("n_neg"),
    ).collect()[0]
    n_pos, n_neg = agg["n_pos"], agg["n_neg"]
    if not n_pos or not n_neg:
        return float("nan")
    return float(
        (agg["rank_pos"] - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    )
