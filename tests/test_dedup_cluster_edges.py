"""Cluster-path dedup via star edges (r9 verdict #1): the
(member -> bucket-min) candidate generator must yield the SAME
connected components as the quadratic pair path, at linear-in-clique
candidate volume — including when buckets mix similarity groups and
the failed-star re-star / residue rounds must resolve them."""

from __future__ import annotations

from pyspark.sql import functions as F

from nerd_spark.operators import components as CCOMP
from nerd_spark.operators import dedup as DD
from nerd_spark.session import read_table


def _clusters(df):
    return sorted(tuple(r) for r in df.collect())


def test_star_edges_match_pair_clusters(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    pairs = DD.minhash_lsh_dedup(
        spark, docs, n_bands=4, rows_per_band=3, threshold=0.5
    )
    edges = DD.minhash_cluster_edges(
        spark, docs, n_bands=4, rows_per_band=3, threshold=0.5
    )
    cp = _clusters(CCOMP.dedup_clusters(pairs))
    cs = _clusters(CCOMP.dedup_clusters(edges))
    assert cp == cs and len(cp) > 0
    # the star generator's candidate volume is linear in clique depth:
    # never MORE verified edges than the pair path emits pairs
    assert edges.count() <= pairs.count()


def test_star_edges_mixed_buckets_rows_per_band_1(spark, sf_dir):
    """rows_per_band=1 makes band signatures single minhashes, so
    buckets aggressively mix similarity groups — the adversarial case
    for a one-shot star (a member similar to a co-member but not to
    the bucket min). The re-star rounds + residue fallback must still
    reproduce the pair path's components."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = DD.minhash_lsh_dedup(
        spark, docs, n_bands=2, rows_per_band=1, threshold=0.5
    )
    edges = DD.minhash_cluster_edges(
        spark, docs, n_bands=2, rows_per_band=1, threshold=0.5
    )
    cp = _clusters(CCOMP.dedup_clusters(pairs))
    cs = _clusters(CCOMP.dedup_clusters(edges))
    assert cp == cs and len(cp) > 0


def test_star_edges_deep_clique_linear_candidates(spark):
    """A 24-deep replica clique: the pair path materializes
    24*23/2 = 276 pairs; the star path must connect the clique with
    exactly 23 verified edges (one round, member -> min)."""
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(24)]
    rows += [(100 + i, f"unique text number {i} with filler {i*7}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    edges = DD.minhash_cluster_edges(spark, docs, threshold=0.5)
    got = edges.collect()
    assert len(got) == 23
    assert all(r.a_id == 0 for r in got)  # all star edges hit the min
    cl = CCOMP.dedup_clusters(edges)
    assert cl.filter(F.col("cluster_root") == 0).count() == 24
    # pair path pays the quadratic output on the same corpus
    pairs = DD.minhash_lsh_dedup(spark, docs, threshold=0.5)
    assert pairs.count() == 276


def test_star_edges_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    edges = DD.minhash_cluster_edges(spark, docs)
    assert edges.collect() == []
    assert [f.name for f in edges.schema.fields] == ["a_id", "b_id", "jaccard"]
