"""Trained-quantizer IVF on disk: build_ivf_index with k-means
centroids + ivf_probe returns exactly what the in-memory trained
ivf_topk returns — the full 100 TB ANN story (trained coarse
quantizer, corpus bucket-stored by list id, partition-pruned probes)
executed end to end."""

from __future__ import annotations

import pytest
import tempfile

from pyspark.sql import functions as F

from nerd_spark.operators import similarity as SIM
from nerd_spark.session import read_table


@pytest.mark.slow
def test_trained_index_probe_equals_in_memory(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    cents = SIM.kmeans_centroids(emb, n_lists=16, n_iter=5)
    want = {
        (r.query_id, r.neighbor_id, r.sim, r.rank)
        for r in SIM.ivf_topk(
            emb, lambda c: c < 10, k=10, n_lists=16, n_probe=4, centroids=cents
        ).collect()
    }

    path = tempfile.mkdtemp(prefix="nerd_ivf_trained_") + "/ivf"
    SIM.build_ivf_index(emb, path, centroids=cents)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    got = {
        (r.query_id, r.neighbor_id, r.sim, r.rank)
        for r in SIM.ivf_probe(spark, path, q, k=10, n_probe=4).collect()
    }
    assert got == want and len(want) > 0


def test_probe_serves_pre_vnorm_index(spark, sf_dir):
    """Indexes built before r8 lack the stored vnorm column; ivf_probe
    must re-fold the norm in-plan and return the identical result."""
    emb = read_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="nerd_ivf_legacy_") + "/ivf"
    SIM.build_ivf_index(emb, path, n_lists=8)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    want = {
        (r.query_id, r.neighbor_id, r.sim, r.rank)
        for r in SIM.ivf_probe(spark, path, q, k=5, n_probe=2).collect()
    }

    # strip vnorm in place (preserving the cid=<n>/ partition layout)
    legacy = tempfile.mkdtemp(prefix="nerd_ivf_legacy_") + "/ivf"
    old = spark.read.parquet(path)
    assert "vnorm" in old.columns
    old.drop("vnorm").repartition(8, F.col("cid")).write.partitionBy(
        "cid"
    ).parquet(legacy)
    spark.read.parquet(path + ".centroids").write.parquet(legacy + ".centroids")
    got = {
        (r.query_id, r.neighbor_id, r.sim, r.rank)
        for r in SIM.ivf_probe(spark, legacy, q, k=5, n_probe=2).collect()
    }
    assert got == want and len(want) > 0
