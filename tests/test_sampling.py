"""Splitting and sequence-packing operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from nerd_spark.operators.sampling import hash_split, pack_sequences, stratified_split
from nerd_spark.session import read_table


def test_hash_split_deterministic_and_salted(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    a = {(r.doc_id, r.split) for r in hash_split(docs, 0.2).collect()}
    b = {(r.doc_id, r.split) for r in hash_split(docs, 0.2).collect()}
    assert a == b  # rerun-stable
    c = {(r.doc_id, r.split) for r in hash_split(docs, 0.2, salt="2").collect()}
    assert a != c  # salt re-rolls
    frac = sum(1 for _, s in a if s == "val") / len(a)
    assert 0.1 < frac < 0.3  # expectation-level quota at n=150


def test_stratified_split_exact_quota(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out = stratified_split(docs, "lang", val_frac=0.25)
    got = (
        out.groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("split") == "val", 1)).alias("nv"),
        )
        .collect()
    )
    assert got  # non-empty
    for r in got:
        assert r.nv == int(0.25 * r.n), (r.lang, r.n, r.nv)


def test_pack_sequences_greedy(spark):
    # budget 10; group g in doc order: 4,5,3,10,2,12,1
    # fill: [4,5]=9 | [3]+10>10 -> wait: 3 fits (9+... ) walk it:
    # 4 -> bin0 fill4; 5 -> fill9; 3 -> 12>10 bin1 fill3; 10 -> bin2
    # fill10; 2 -> bin3 fill2; 12 -> bin4 fill12 (oversized own bin);
    # 1 -> bin5 fill1
    rows = [
        (1, "g", "a a a a"),
        (2, "g", "b b b b b"),
        (3, "g", "c c c"),
        (4, "g", "d d d d d d d d d d"),
        (5, "g", "e e"),
        (6, "g", "f f f f f f f f f f f f"),
        (7, "g", "h"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc_id: r.bin_idx for r in pack_sequences(df, budget=10).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 2, 5: 3, 6: 4, 7: 5}


def test_pack_sequences_groups_independent(spark):
    rows = [(1, "x", "a a a"), (2, "y", "b b b"), (3, "x", "c c c")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {(r.doc_id): (r.source, r.bin_idx) for r in pack_sequences(df, budget=8).collect()}
    # each group starts its own bin 0
    assert out == {1: ("x", 0), 2: ("y", 0), 3: ("x", 0)}


def test_temperature_mixture_balances_skewed_sources(spark):
    """T=0.5 sharpening on a skewed corpus (q ∝ p², the softmax
    convention: T<1 concentrates on dominant sources), with the exact
    rate arithmetic the operator promises (rate = q_s·N/n_s) and the
    realized copy counts within hash-sampling tolerance."""
    from nerd_spark.operators.sampling import temperature_mixture

    docs = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id long, source string",
    )
    out = temperature_mixture(docs).groupBy("source").count().collect()
    got = {r.source: r["count"] for r in out}
    # expected rates: p=(0.9,0.1); w=(0.81,0.01); q=(0.987..,0.012..)
    # rate_big = q_b*1000/900 ≈ 1.0973, rate_small = q_s*1000/100 ≈ 0.1219
    import pytest

    assert got["big"] == pytest.approx(900 * 1.0973, rel=0.05)
    assert got["small"] == pytest.approx(100 * 0.1219, rel=0.6)  # 12±hash noise
    # deterministic: rerun identical
    again = {r.source: r["count"] for r in temperature_mixture(docs).groupBy("source").count().collect()}
    assert again == got


def test_temperature_mixture_general_T(spark):
    """The pow-based path: T=1.0 is proportional sampling — every
    source's realized count stays within hash-sampling tolerance of
    its input count (rates ~1.0). In the q ∝ p^(1/T) convention the
    rare source's output share is MONOTONE INCREASING in T (higher
    temperature flattens): T=0.5 sharpens, T=2.0 upweights it past
    its raw 10% toward uniform."""
    import pytest

    from nerd_spark.operators.sampling import temperature_mixture

    docs = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id long, source string",
    )

    prop = {
        r.source: r["count"]
        for r in temperature_mixture(docs, temperature=1.0)
        .groupBy("source")
        .count()
        .collect()
    }
    assert prop["big"] == pytest.approx(900, rel=0.02)
    assert prop["small"] == pytest.approx(100, rel=0.15)

    def small_share(T):
        got = {
            r.source: r["count"]
            for r in temperature_mixture(docs, temperature=T)
            .groupBy("source")
            .count()
            .collect()
        }
        return got.get("small", 0) / sum(got.values())

    s05, s10, s20 = small_share(0.5), small_share(1.0), small_share(2.0)
    assert s05 < s10 < s20
    # T=2.0: q_small = sqrt(.1)/(sqrt(.9)+sqrt(.1)) ~ 0.25 — upweighted
    assert s20 == pytest.approx(0.25, rel=0.15)

    with pytest.raises(ValueError):
        temperature_mixture(docs, temperature=0.0)


def test_temperature_mixture_zero_weight_source_raises(spark):
    """A source whose share rounds to wt=0 at the 6-dp quantum must
    fail loudly (in-plan guard), not silently vanish from the mixture
    (ADVICE r6)."""
    import pytest

    from nerd_spark.operators.sampling import temperature_mixture

    # share 1/3001 ~ 3.3e-4 < 7.1e-4 -> wt rounds to 0 at T=0.5
    docs = spark.createDataFrame(
        [(i, "big") for i in range(3000)] + [(9999, "tiny")],
        "doc_id long, source string",
    )
    with pytest.raises(Exception, match="weight quantum|wt=0"):
        temperature_mixture(docs).count()
