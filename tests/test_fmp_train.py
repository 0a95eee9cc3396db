"""Train -> score round trip for the FMP model seam (VERDICT r2 #3).

The reference's loop: log feature vectors + labels daily, retrain
XGBoost offline, feed booster.predict back into the scorer
(NERDd/fmp_updater.py:527-575, :654-683). Here the same loop runs with
the distributed logistic trainer: training_frame -> fit_logistic ->
score(predict=model.predict), evaluated on a later temporal split the
fit never saw.
"""

import pytest
from pyspark.sql import functions as F

from nerd_spark.ml.fmp import score, training_frame
from nerd_spark.ml.train import auc, fit_logistic
from nerd_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def frames(spark):
    t = load_tables(spark, SF_DIR, "events", "customer", "nation")
    ev = t["events"]
    tmax = ev.agg(F.max("ts").alias("m")).collect()[0]["m"]
    past = ev.filter(
        F.col("ts") <= F.expr(f"timestamp'{tmax}' - INTERVAL 24 HOURS")
    )
    # train: features as of T-48h, labels from (T-48h, T-24h]
    train = training_frame(past, t["customer"], t["nation"]).cache()
    train.count()
    # eval: features as of T-24h, labels from (T-24h, T] — strictly
    # after every event the fit saw (rolling-origin temporal split)
    ev_frame = training_frame(ev, t["customer"], t["nation"]).cache()
    ev_frame.count()
    yield train, ev_frame
    train.unpersist()
    ev_frame.unpersist()


@pytest.mark.slow
def test_train_score_roundtrip_beats_stub(frames):
    train, ev_frame = frames
    model = fit_logistic(train, n_iter=20, lr=3.0)
    # learned, non-stub weights actually flowed through the seam
    assert float(abs(model.weights).sum()) > 0.1
    a_trained = auc(score(ev_frame, predict=model.predict))
    a_stub = auc(score(ev_frame))
    a_fit = auc(score(train, predict=model.predict))
    # measured at sf0.01: trained ~0.57 held-out / ~0.90 train-set,
    # stub ~0.41 (labels are mostly synthetic noise; margins are wide)
    assert a_fit > 0.8, "fit failed to separate its own training set"
    assert a_trained > 0.5, "held-out AUC at or below chance"
    assert a_trained > a_stub + 0.05, "trained model does not beat stub"


@pytest.mark.slow
def test_fit_is_deterministic(frames):
    train, _ = frames
    m1 = fit_logistic(train, n_iter=5, lr=1.0)
    m2 = fit_logistic(train, n_iter=5, lr=1.0)
    assert m1.bias == m2.bias
    assert (m1.weights == m2.weights).all()


@pytest.mark.slow
def test_gbt_train_score_roundtrip(frames):
    """Spark-native GBT (pyspark.ml) through the same FEATURE_SPEC:
    the model-family parity with the reference's XGBoost scorer.
    Trained on the earlier temporal split, evaluated on the later one
    — must beat chance clearly and be seed-deterministic; scoring is
    JVM-side (no Python UDF in the plan)."""
    from nerd_spark.ml.gbt import fit_gbt, score_gbt

    train, ev_frame = frames
    model = fit_gbt(train, max_iter=10, max_depth=3)
    scored = score_gbt(ev_frame.drop("label"), model).join(
        ev_frame.select("entity", "label"), "entity"
    )
    a = auc(scored.select("fmp", "label"))
    # the sf0.01 training frame is ~150 rows — far too small for trees
    # to beat the linear model (logistic: ~0.61 here); the bar is
    # clearly-above-chance, the point is model-FAMILY parity with the
    # reference's gradient-boosted scorer + the JVM scoring plan
    assert a >= 0.55, f"GBT AUC {a}"
    # no Python evaluation in the scoring plan
    plan = score_gbt(ev_frame.drop("label"), model)._jdf.queryExecution()
    assert "BatchEvalPython" not in plan.executedPlan().toString()
    assert "ArrowEvalPython" not in plan.executedPlan().toString()
    # determinism under the fixed seed
    m2 = fit_gbt(train, max_iter=10, max_depth=3)
    s1 = sorted(tuple(r) for r in score_gbt(ev_frame.drop("label"), model).collect())
    s2 = sorted(tuple(r) for r in score_gbt(ev_frame.drop("label"), m2).collect())
    assert s1 == s2
