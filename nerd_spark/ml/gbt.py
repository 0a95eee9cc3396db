"""Gradient-boosted-tree FMP model — Spark-native parity with the
reference's XGBoost scorer.

The reference trains an XGBoost booster driver-side and scores rows
with booster.predict (reference: NERDd/fmp_updater.py:527-575 feature
logging, :654-683 predict). XGBoost itself is absent from this
environment, but Spark SHIPS a distributed gradient-boosted-tree
implementation — `pyspark.ml.classification.GBTClassifier` — so the
model-family gap closes with a fully Spark-first loop:

- training is distributed (no driver-side feature matrix at all — an
  improvement over the reference's in-driver xgb.train);
- scoring is `model.transform`, i.e. JVM-side tree evaluation inside
  the plan — no Python UDF, no Arrow hop (stronger than the
  booster.predict pandas seam, which remains available in ml/train's
  `score(predict=...)` for a real xgboost drop-in).

The same FEATURE_SPEC transforms feed both this and the logistic
trainer, so the two are interchangeable behind the fmp scorer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nerd_spark.ml.fmp import FEATURE_SPEC
from nerd_spark.ml.train import _transform_col

_VEC = "fmp_features_vec"


def _assemble(frame: DataFrame):
    from pyspark.ml.feature import VectorAssembler

    cols = [
        _transform_col(name, kind).alias(f"t_{name}")
        for name, kind, _ in FEATURE_SPEC
    ]
    base = frame.select("entity", *cols, *(
        ["label"] if "label" in frame.columns else []
    ))
    asm = VectorAssembler(
        inputCols=[f"t_{n}" for n, _, _ in FEATURE_SPEC],
        outputCol=_VEC,
        handleInvalid="keep",
    )
    return asm.transform(base)


def fit_gbt(
    training: DataFrame,
    max_iter: int = 20,
    max_depth: int = 3,
    step_size: float = 0.1,
    seed: int = 7,
):
    """Fit a GBT classifier on a training_frame (features + label).
    Every boosting iteration is a distributed job over the assembled
    frame; the returned model holds only the trees."""
    from pyspark.ml.classification import GBTClassifier

    gbt = GBTClassifier(
        featuresCol=_VEC,
        labelCol="label",
        maxIter=max_iter,
        maxDepth=max_depth,
        stepSize=step_size,
        seed=seed,
    )
    return gbt.fit(_assemble(training))


def score_gbt(features: DataFrame, model) -> DataFrame:
    """(entity, fmp) — P(misbehaves) from the fitted trees, evaluated
    JVM-side by model.transform (no Python in the scoring path)."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(_assemble(features))
    return scored.select(
        "entity",
        F.round(vector_to_array("probability")[1], 6).alias("fmp"),
    )
