"""Unit tests: mixture sampling, shard assignment, TF-IDF keywords,
incremental minhash dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nerd_spark.operators import dedup as DD
from nerd_spark.operators.keywords import tfidf_top_terms
from nerd_spark.operators.sampling import mixture_sample, shard_assign
from nerd_spark.session import read_table


def test_mixture_sample_rates_and_determinism(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    rates = {"src0": 3.0, "src1": 0.0}
    out = mixture_sample(docs, rates=rates).cache()
    per_src = {
        r.source: (r.n, r.max_epoch)
        for r in out.groupBy("source")
        .agg(F.count("*").alias("n"), F.max("epoch").alias("max_epoch"))
        .collect()
    }
    n0 = docs.filter(F.col("source") == "src0").count()
    # integer rate 3.0: exactly 3 copies of every doc, epochs 0..2
    assert per_src["src0"] == (3 * n0, 2)
    # rate 0.0 drops the source entirely
    assert "src1" not in per_src
    # unlisted sources keep exactly one copy
    n2 = docs.filter(F.col("source") == "src2").count()
    assert per_src["src2"] == (n2, 0)
    # deterministic: same salt -> same sample
    again = mixture_sample(docs, rates=rates)
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0


def test_mixture_fractional_rate_bounds(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out = mixture_sample(docs, rates={}, default_rate=0.5)
    n, kept = docs.count(), out.count()
    # hash-uniform keep: expectation n/2, bound loosely (binomial tail)
    assert 0.25 * n < kept < 0.75 * n


def test_shard_assign_partition_and_positions(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out = shard_assign(docs, n_shards=4).cache()
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    stats = out.groupBy("shard").agg(
        F.count("*").alias("n"), F.min("pos").alias("lo"), F.max("pos").alias("hi")
    )
    for r in stats.collect():
        assert 0 <= r.shard < 4
        # positions are a dense 0..n-1 sequence per shard
        assert (r.lo, r.hi) == (0, r.n - 1)


def test_tfidf_top_terms_shape(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out = tfidf_top_terms(docs, k=2).cache()
    per_doc = out.groupBy("doc_id").count()
    assert per_doc.filter(F.col("count") > 2).count() == 0
    # rank 1 score >= rank 2 score within a doc
    bad = (
        out.groupBy("doc_id")
        .pivot("rank", [1, 2])
        .agg(F.first("score"))
        .filter(F.col("1") < F.col("2"))
        .count()
    )
    assert bad == 0


def test_mixture_sample_properties(spark, sf_dir):
    """Property sweep over rate shapes: per-doc copy counts respect
    floor(rate) <= n <= ceil(rate); integer rates are exact."""
    import math

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    for rates in (
        {"src0": 0.3, "src1": 1.7, "src2": 4.0},
        {"src0": 0.999, "src3": 2.5},
        {},
    ):
        out = (
            mixture_sample(docs, rates=rates, salt=f"s{len(rates)}")
            .groupBy("doc_id", "source")
            .agg(F.count("*").alias("copies"), F.max("epoch").alias("max_e"))
        )
        joined = docs.join(out, ["doc_id", "source"], "left").fillna(
            0, subset=["copies"]
        )
        for r in joined.collect():
            rate = rates.get(r.source, 1.0)
            assert math.floor(rate) <= r.copies <= math.ceil(rate), (
                r.source,
                rate,
                r.copies,
            )
            if r.copies:
                assert r.max_e == r.copies - 1  # dense epochs 0..n-1


def test_shard_assign_deterministic_and_balanced(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    a = {(r.doc_id, r.shard, r.pos) for r in shard_assign(docs, 8).collect()}
    b = {(r.doc_id, r.shard, r.pos) for r in shard_assign(docs, 8).collect()}
    assert a == b
    sizes = [
        r["count"]
        for r in shard_assign(docs, 8).groupBy("shard").count().collect()
    ]
    n = docs.count()
    # hash balance: no shard more than 2x the fair share
    assert max(sizes) <= 2 * n / 8


def test_leakage_safe_split_keeps_pairs_together(spark, sf_dir):
    """The property the operator exists for: no near-dup pair may
    straddle the train/val boundary."""
    from nerd_spark.queries import REGISTRY

    split = {
        r.doc_id: r.split
        for r in REGISTRY["leakage_safe_split"](spark, sf_dir).collect()
    }
    pairs = DD.minhash_lsh_dedup(spark, read_table(spark, sf_dir, "documents"))
    straddlers = [
        (r.a_id, r.b_id)
        for r in pairs.collect()
        if split[r.a_id] != split[r.b_id]
    ]
    assert straddlers == []
    assert "val" in split.values() and "train" in split.values()


def test_incremental_subset_of_full_pairs(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    full = {
        (r.a_id, r.b_id)
        for r in DD.minhash_lsh_dedup(spark, docs, threshold=0.5).collect()
    }
    inc = {
        (r.a_id, r.b_id)
        for r in DD.incremental_minhash_pairs(docs, lambda c: c % 5 == 4).collect()
    }
    # incremental pairs = exactly the full pairs touching the batch
    expect = {p for p in full if p[0] % 5 == 4 or p[1] % 5 == 4}
    assert inc == expect


def test_term_count_pairs_rle_and_projection_binding(spark, sf_dir):
    """The RLE waist: (a) equals the explode+groupBy word count
    exactly; (b) its optimized plan keeps the sorted-token array in
    its OWN projection (exactly one array_sort) — if a future
    CollapseProject change re-nests it into the HOF lambdas, the
    sort re-evaluates per element and the operator goes O(n^2)
    (measured 70x at sf0.1); (c) empty/whitespace docs yield []."""
    from pyspark.sql import functions as F

    from nerd_spark.functions.text import tokens
    from nerd_spark.operators.keywords import term_count_pairs

    docs = read_table(spark, sf_dir, "documents")
    extra = docs.limit(2).withColumn("text", F.lit("  ")).withColumn(
        "doc_id", F.col("doc_id") + 10_000_000
    )
    docs = docs.unionByName(extra)

    rle = term_count_pairs(docs)
    got = (
        rle.select("doc_id", F.explode("tc").alias("p"))
        .select("doc_id", "p.term", "p.tf")
    )
    want = (
        docs.select(F.col("doc_id"), F.explode(tokens("text")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    # whitespace-only docs survive with an empty array (not null/missing)
    empties = rle.filter(F.col("doc_id") >= 10_000_000)
    assert empties.count() == 2
    assert empties.filter(F.size("tc") != 0).count() == 0

    # plan binding on a single-branch frame (the union above has one
    # array_sort per branch, which would double-count)
    plan = (
        term_count_pairs(read_table(spark, sf_dir, "documents"))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("array_sort") == 1, plan


def test_waist_checkpoint_is_size_adaptive(spark, sf_dir):
    """waist_checkpoint (operators/dedup.py): below the source-bytes
    threshold the frame is returned UNCHANGED (lazy lineage — the
    checkpoint jobs cost more than the recompute they save at test
    SF); at/above it the lineage is truncated to a LogicalRDD; an
    unknown size (in-memory lineage) must assume-big and checkpoint
    so the scale path never silently degrades."""
    from nerd_spark.operators.dedup import waist_checkpoint
    from nerd_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")

    small = waist_checkpoint(docs, min_bytes=1 << 40)  # 1 TiB floor
    assert "LogicalRDD" not in small._jdf.queryExecution().optimizedPlan().toString()
    assert small is docs

    big = waist_checkpoint(docs, min_bytes=1)
    assert "LogicalRDD" in big._jdf.queryExecution().optimizedPlan().toString()
    assert big.count() == docs.count()

    # in-memory lineage: no input files -> assume big, checkpoint
    mem = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    out = waist_checkpoint(mem, min_bytes=1 << 40)
    assert "LogicalRDD" in out._jdf.queryExecution().optimizedPlan().toString()


@pytest.mark.slow
def test_weighted_sample_aes_properties(spark):
    """weighted_sample (Efraimidis-Spirakis A-ES): exact k without
    replacement; inclusion frequency across independent salts tracks
    the weights; the global path compiles to TakeOrderedAndProject
    (per-partition top-k, never a full sort); non-positive weights
    raise in-plan."""
    import pytest
    from pyspark.sql import functions as F

    from nerd_spark.operators.sampling import weighted_sample

    rows = [(i, "s", 100.0 if i < 5 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, wt double")

    # exact k, no replacement, deterministic per salt
    got = weighted_sample(df, "wt", k=10, salt="a")
    ids = [r.doc_id for r in got.collect()]
    assert len(ids) == 10 and len(set(ids)) == 10
    again = [r.doc_id for r in weighted_sample(df, "wt", k=10, salt="a").collect()]
    assert sorted(ids) == sorted(again)

    # global path: TakeOrderedAndProject, not a global Sort+Limit
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan

    # weight-proportional inclusion: the five w=100 docs (5/100 of
    # rows, ~84% of total weight) should dominate the sample across
    # salts — each heavy doc included far more often than any light one
    heavy_hits = light_hits = 0
    for s in range(30):
        picked = {
            r.doc_id
            for r in weighted_sample(df, "wt", k=10, salt=f"s{s}").collect()
        }
        heavy_hits += sum(1 for i in picked if i < 5)
        light_hits += sum(1 for i in picked if i >= 5)
    # expectation: heavies ~5*30=150 (always in), lights ~150/95 each
    assert heavy_hits >= 120, (heavy_hits, light_hits)
    assert heavy_hits / 5 > 10 * (light_hits / 95)

    # per-stratum: k per group even when a group has fewer rows
    df2 = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 1.0), (3, "b", 1.0)],
        "doc_id long, source string, wt double",
    )
    per = weighted_sample(df2, "wt", k=2, strata_col="source").collect()
    by_src = {}
    for r in per:
        by_src.setdefault(r.source, []).append(r.doc_id)
    assert len(by_src["a"]) == 2 and len(by_src["b"]) == 1

    # non-positive weight: in-plan raise (would silently sample the
    # WORST rows otherwise)
    bad = spark.createDataFrame(
        [(1, "a", 0.0)], "doc_id long, source string, wt double"
    )
    with pytest.raises(Exception, match="non-positive weight"):
        weighted_sample(bad, "wt", k=1).collect()


def _hof_token_stats(docs):
    from nerd_spark.operators.keywords import _token_stats_hof

    return _token_stats_hof(docs, "source", "text")


def test_token_stats_kernel_parity_adversarial(spark):
    # every semantic edge the byte-LUT kernel must reproduce from the
    # HOF reference: leading/trailing non-space whitespace (split
    # limit=-1 keeps empty tokens; trim strips 0x20 ONLY), empty and
    # all-whitespace docs, control bytes outside Java's \s (slow-path
    # reroute), non-ASCII text, NULL text, a NULL group, an all-NULL
    # group, digits/punct runs.
    from nerd_spark.operators import keywords as KW

    rows = [
        ("a", "plain words here"),
        ("a", "  spaces  around  "),
        ("a", "\ttab leads"),
        ("a", "trailing tab\t"),
        ("a", "\t\n"),
        ("a", ""),
        ("a", "   "),
        ("a", "x\x1cy \x00z"),
        ("a", "mix3d t0kens, 42!  a1b2"),
        ("b", "héllo wörld — naïve"),
        ("b", "emoji \U0001f600 here"),
        ("b", None),
        ("c", None),
        (None, "null group text"),
    ] * 7
    docs = spark.createDataFrame(rows, "source string, text string").repartition(5)
    want = sorted(map(tuple, _hof_token_stats(docs).collect()), key=str)
    got = sorted(map(tuple, KW.token_stats(docs).collect()), key=str)
    assert got == want


def test_token_stats_kernel_parity_corpus(spark, sf_dir):
    from nerd_spark.operators import keywords as KW
    from nerd_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    want = sorted(map(tuple, _hof_token_stats(docs).collect()))
    # force the kernel path (the size-adaptive gate would route this
    # small corpus to the HOF form and make the test vacuous)
    spark.conf.set("spark.nerd.tokenStatsKernelMinBytes", "0")
    try:
        got = sorted(map(tuple, KW.token_stats(docs).collect()))
    finally:
        spark.conf.unset("spark.nerd.tokenStatsKernelMinBytes")
    assert got == want
    # and the gate itself: a tiny parquet input routes to the HOF plan
    # (no mapInPandas / ArrowEvalPython node in the executed plan)
    plan = KW.token_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan



def test_bigram_logprob_properties(spark):
    # word-order sensitivity: under a corpus where "a b" dominates,
    # the in-order doc must outscore the shuffled one; self-model
    # totals: sum over docs of n_bigrams == total kept pairs; docs
    # with <2 tokens produce no row; ''-pairs from edge whitespace drop
    from pyspark.sql import functions as F

    from nerd_spark.operators.keywords import bigram_logprob

    rows = (
        [(i, "the cat sat") for i in range(10)]
        + [(100, "sat cat the"), (101, "a"), (102, ""), (103, "\ta b")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.n_bigrams, r.avg_logprob) for r in bigram_logprob(docs).collect()}
    assert 101 not in out and 102 not in out
    # doc 103: tokens ['', 'a', 'b'] -> pairs ('','a') dropped, ('a','b') kept
    assert out[103][0] == 1
    assert out[0][1] > out[100][1]  # in-order beats reversed-order
    n_pairs = sum(v[0] for v in out.values())
    want_pairs = (
        docs.select(F.split(F.trim("text"), r"\s+").alias("a"))
        .filter(F.size("a") >= 2)
        .select(F.explode(F.zip_with(
            F.slice("a", 1, F.size("a") - 1), F.slice("a", 2, F.size("a") - 1),
            lambda x, y: F.struct(x.alias("w1"), y.alias("w2")))).alias("p"))
        .filter((F.col("p.w1") != "") & (F.col("p.w2") != ""))
        .count()
    )
    assert n_pairs == want_pairs


def test_bigram_logprob_kernel_matches_jvm_fallback(spark):
    """The two scoring paths — broadcast-model text-level kernel vs
    JVM explode+join (forced via score_broadcast_max_pairs=0) — must
    agree exactly on an adversarial corpus: tabs/newlines as
    separators, leading/trailing whitespace (''-token artifacts),
    repeated pairs, non-ASCII text (kernel slow path), interior
    control bytes, null text, and sub-2-token docs."""
    from nerd_spark.operators.keywords import bigram_logprob

    rows = [
        (1, "the cat\tsat on\nthe mat the cat"),
        (2, "  leading and trailing  "),
        (3, "\t\ntab lead"),
        (4, "trail end \t"),
        (5, "café au lait café au"),   # non-ASCII slow path
        (6, "x\x00y x\x00y x\x00y"),              # NUL inside tokens
        (7, None),
        (8, "one"),
        (9, ""),
        (10, "the cat sat"),
        (11, "a  b   c"),                          # separator runs
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kernel = {
        r.doc_id: (r.n_bigrams, r.avg_logprob)
        for r in bigram_logprob(docs).collect()
    }
    jvm = {
        r.doc_id: (r.n_bigrams, r.avg_logprob)
        for r in bigram_logprob(docs, score_broadcast_max_pairs=0).collect()
    }
    assert kernel == jvm
    assert 7 not in kernel and 8 not in kernel and 9 not in kernel
