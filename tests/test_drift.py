"""Distribution-drift operator (operators/drift.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nerd_spark.operators.drift import distribution_drift


def test_identical_snapshots_score_zero(spark):
    df = spark.createDataFrame([(float(i % 50),) for i in range(2000)], "v double")
    r = distribution_drift(df, df, "v").first()
    assert r.n_ref == r.n_new == 2000
    assert r.psi == 0.0 and r.js_div == 0.0


def test_shift_scores_high_and_is_asymmetry_safe(spark):
    ref = spark.createDataFrame([(float(i % 100),) for i in range(5000)], "v double")
    shifted = ref.select((F.col("v") + 80.0).alias("v"))  # mass into top buckets
    r = distribution_drift(ref, shifted, "v").first()
    assert r.psi > 0.25  # "shifted" by the standard rule of thumb
    import math

    assert 0 < r.js_div <= math.log(2) + 1e-9  # JS bound (natural log)
    # out-of-range values clamp to edge buckets rather than vanishing
    assert r.n_new == 5000


def test_constant_reference_and_empty_new(spark):
    const = spark.createDataFrame([(7.0,)] * 100, "v double")
    moved = spark.createDataFrame([(9.0,)] * 100, "v double")
    # constant ref: width degenerates to 1; identical new scores 0
    assert distribution_drift(const, const, "v").first().psi == 0.0
    # a moved constant lands in the top clamp bucket: loud score
    assert distribution_drift(const, moved, "v").first().psi > 0.25
    # empty new: maximal-drift number, not a crash
    empty = spark.createDataFrame([], "v double")
    r = distribution_drift(const, empty, "v").first()
    assert r.n_new == 0 and r.psi > 0.25
    # empty/all-null REFERENCE has no bucket anchor: loud error
    with pytest.raises(ValueError):
        distribution_drift(empty, const, "v")
    with pytest.raises(ValueError):
        distribution_drift(const, moved, "v", n_buckets=1)


def test_nulls_ignored_both_sides(spark):
    ref = spark.createDataFrame(
        [(float(i % 10),) for i in range(1000)] + [(None,)] * 50, "v double"
    )
    r = distribution_drift(ref, ref, "v").first()
    assert r.n_ref == r.n_new == 1000 and r.psi == 0.0


def test_shingle_novelty_edges(spark):
    from nerd_spark.operators.drift import shingle_novelty

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "beta gamma delta epsilon"),
         (3, None), (4, "too short")],
        "doc_id long, text string",
    )
    # identical snapshots: zero novelty
    r = shingle_novelty(docs, docs).first()
    assert r.novelty_rate == 0.0 and r.novel_shingles == 0
    # doc1: {alpha beta gamma, beta gamma delta}; doc2 shares the
    # second and adds {gamma delta epsilon} -> 3 distinct overall
    assert r.n_ref_shingles == r.n_new_shingles == 3
    # disjoint text: full novelty
    other = spark.createDataFrame(
        [(9, "one two three four five")], "doc_id long, text string"
    )
    r2 = shingle_novelty(docs, other).first()
    assert r2.novelty_rate == 1.0 and r2.novel_shingles == r2.n_new_shingles == 3
    # empty new: rate 0 via the guard, no division error
    empty = spark.createDataFrame([], "doc_id long, text string")
    r3 = shingle_novelty(docs, empty).first()
    assert r3.n_new_shingles == 0 and r3.novelty_rate == 0.0
