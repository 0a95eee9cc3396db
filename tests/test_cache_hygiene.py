"""Session-lifetime cache hygiene (ADVICE r9, low).

Operators that persist an intermediate into their returned plan used
to document the pin as "ContextCleaner reclaims on plan GC" — false
for DataFrame persists: the SQL CacheManager strong-references every
cached plan until an explicit unpersist, so a long-lived session
(notebook, streaming driver, the bench loop) accumulated storage
entries without bound. cacheutil.tie_unpersist makes the documented
lifetime real: dropping the result handle releases the pinned
inputs. These tests drive each tied operator through the
build -> materialize -> drop cycle and assert executor storage
returns to its pre-call level.
"""

from __future__ import annotations

import gc
import time

import pytest
from pyspark.sql import functions as F

from nerd_spark.operators.cacheutil import tie_unpersist
from nerd_spark.operators.sketches import (
    exact_quantiles,
    exact_quantiles_by,
    heavy_hitter_terms,
    heavy_hitters,
    heavy_hitters_by,
    top_frequent,
)


def _storage_count(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def _assert_drains(spark, base: int, timeout: float = 15.0) -> None:
    """Poll for async unpersist to land (blocking=False)."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        gc.collect()
        if _storage_count(spark) <= base:
            return
        time.sleep(0.2)
    raise AssertionError(
        f"storage entries did not drain: {_storage_count(spark)} > {base}"
    )


@pytest.fixture()
def ev(spark):
    return spark.range(5000).select(
        (F.col("id") % 37).alias("k"),
        (F.col("id") % 5).alias("g"),
        (F.col("id") % 211).cast("double").alias("v"),
    )


@pytest.mark.slow
def test_tie_unpersist_releases_on_gc(spark):
    base = _storage_count(spark)
    pinned = spark.range(1000).select((F.col("id") % 7).alias("k")).persist()
    res = tie_unpersist(pinned.groupBy("k").count(), pinned)
    assert res.count() == 7
    assert _storage_count(spark) > base  # pinned while the handle lives
    del res, pinned
    _assert_drains(spark, base)


def test_tie_transfer_survives_wrapping(spark):
    """A tie-carrying intermediate passed to a second tie_unpersist
    transfers ownership: dropping the intermediate must NOT release
    the pin while the outer result is alive."""
    base = _storage_count(spark)
    pinned = spark.range(1000).select((F.col("id") % 7).alias("k")).persist()
    pinned.count()
    inner = tie_unpersist(pinned.groupBy("k").count(), pinned)
    outer = tie_unpersist(inner.filter(F.col("count") > 0), inner)
    del inner, pinned
    gc.collect()
    time.sleep(0.5)
    assert _storage_count(spark) > base  # outer still owns the pin
    assert outer.count() == 7
    del outer
    _assert_drains(spark, base)


def test_tie_is_noop_for_uncached_inputs(spark):
    df = spark.range(10)
    out = tie_unpersist(df.select("id"), df)
    assert not hasattr(out, "_nerd_cache_tie") or out._nerd_cache_tie is None


@pytest.mark.parametrize(
    "call",
    [
        lambda ev: heavy_hitters(ev, "k", 0.02),  # plain path
        lambda ev: heavy_hitters(ev, "k", 0.02, plain_max_distinct=0),
        lambda ev: top_frequent(ev, "k", k=5),  # plain path
        lambda ev: top_frequent(ev, "k", k=5, plain_max_distinct=0),
        lambda ev: heavy_hitters_by(ev, "g", "k", 0.02),  # plain path
        lambda ev: heavy_hitters_by(ev, "g", "k", 0.02, plain_max_distinct=0),
        lambda ev: exact_quantiles(ev, "v", [0.5, 0.9], strategy="histogram"),
        lambda ev: exact_quantiles_by(
            ev, "g", "v", [0.5], strategy="histogram"
        ),
        lambda ev: exact_quantiles_by(ev, "g", "v", [0.5], strategy="bracket"),
    ],
    ids=[
        "hh_plain",
        "hh_screen",
        "topf_plain",
        "topf_screen",
        "hhby_plain",
        "hhby_screen",
        "quantile_hist",
        "quantile_by_hist",
        "quantile_by_bracket",
    ],
)
def test_sketch_ops_release_cache(spark, ev, call):
    base = _storage_count(spark)
    res = call(ev)
    rows = res.collect()
    assert rows is not None
    del res
    _assert_drains(spark, base)


def test_heavy_hitter_terms_releases_cache(spark):
    base = _storage_count(spark)
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("the quick fox "), (F.col("id") % 9).cast("string")).alias(
            "text"
        ),
    )
    res = heavy_hitter_terms(docs, 0.05)
    assert res.count() > 0
    del res, docs
    _assert_drains(spark, base)


@pytest.mark.parametrize("op", ["jaccard", "minhash"])
def test_pair_jaccard_callers_release_cache(spark, op):
    from nerd_spark.operators.dedup import jaccard_dedup, minhash_lsh_dedup

    base = _storage_count(spark)
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(6)]
        + [(100 + i, f"unique text number {i} with words {i * 7}") for i in range(6)],
        "doc_id long, text string",
    )
    res = (
        jaccard_dedup(docs)
        if op == "jaccard"
        else minhash_lsh_dedup(spark, docs)
    )
    assert res.count() >= 1
    del res, docs
    _assert_drains(spark, base)


def test_shared_tie_releases_after_both_handles(spark):
    from nerd_spark.operators.cacheutil import tie_unpersist_shared

    base = _storage_count(spark)
    pinned = spark.range(100).select((F.col("id") % 3).alias("k")).persist()
    pinned.count()
    a = pinned.filter(F.col("k") == 0)
    b = pinned.filter(F.col("k") != 0)
    a, b = tie_unpersist_shared([a, b], pinned)
    del pinned
    del a
    gc.collect()
    time.sleep(0.5)
    assert _storage_count(spark) > base  # b still owns a share
    assert b.count() > 0
    del b
    _assert_drains(spark, base)


def test_bigram_lm_jvm_path_releases_cache(spark):
    from nerd_spark.operators.keywords import bigram_logprob

    base = _storage_count(spark)
    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.lit("a b c d e f g h").alias("text"),
    )
    # score_broadcast_max_pairs=0 forces the over-bound JVM path,
    # the branch that keeps bg inside the returned plan
    res = bigram_logprob(docs, score_broadcast_max_pairs=0)
    assert res.count() == 50
    del res, docs
    _assert_drains(spark, base)


def test_registry_card_tie_transfers_and_releases(spark, sf_dir):
    """corpus_stats_card derives from the quantile result — the tie
    must TRANSFER to the card's returned frame (keeping the histogram
    cached until the caller drops the card), then drain."""
    from nerd_spark.queries import REGISTRY

    base = _storage_count(spark)
    res = REGISTRY["corpus_stats_card"](spark, sf_dir)
    assert res.collect()
    del res
    _assert_drains(spark, base)
