"""Plan-shape assertions for the round-4 operators — the scale claims
in the docstrings, checked against the executed plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from nerd_spark.operators.dedup import incremental_minhash_pairs
from nerd_spark.operators.sampling import mixture_sample
from nerd_spark.session import read_table


def _plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_mixture_sample_is_map_only(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    plan = _plan(mixture_sample(docs, rates={"src0": 2.0, "src1": 0.5}))
    assert "Exchange" not in plan, "mixture sampling must not shuffle"


def test_incremental_dedup_broadcasts_batch(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        pairs = incremental_minhash_pairs(docs, lambda c: c % 5 == 4)
        plan = _plan(pairs)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # candidate generation: batch band table broadcast against the
    # index side — the corpus never shuffles for the band join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quality_filter_single_scan_no_udf(spark, sf_dir):
    from nerd_spark.ml.quality import quality_scores

    docs = read_table(spark, sf_dir, "documents")
    plan = _plan(quality_scores(docs))
    assert "Exchange" not in plan, "quality scoring is a map-only projection"
    assert "Python" not in plan, "quality scoring must stay JVM-side"


def test_pair_jaccard_bounded_broadcast(spark):
    """_pair_jaccard decides broadcast from a MEASURED candidate
    count, not Catalyst's estimate (the 160x stress corpus — every
    doc in a 160-replica clique — made the estimate-driven broadcast
    OOM the driver). Under the bound the plan pins
    BroadcastHashJoin; over it the merge hint forbids broadcast
    (SortMergeJoin), and both paths return identical Jaccards."""
    from nerd_spark.operators.dedup import _pair_jaccard

    sets = spark.createDataFrame(
        [(i, [f"s{i}", "shared", f"t{i % 2}"]) for i in range(6)],
        "id long, ss array<string>",
    )
    cand = spark.createDataFrame(
        [(0, 2), (1, 3), (2, 4)], "a_id long, b_id long"
    )

    fast = _pair_jaccard(cand, sets)  # 3 pairs, well under the bound
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan

    slow = _pair_jaccard(cand, sets, broadcast_max_pairs=1)
    plan2 = slow._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan2, plan2
    assert "SortMergeJoin" in plan2, plan2

    key = lambda r: (r.a_id, r.b_id, r.jaccard)  # noqa: E731
    assert sorted(map(key, fast.collect())) == sorted(map(key, slow.collect()))
