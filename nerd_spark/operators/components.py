"""Distributed connected components over a near-dup pair graph.

Dedup pair generators (minhash/simhash LSH, embedding buckets) emit
PAIRS; turning pairs into duplicate CLUSTERS — so one canonical doc
per cluster survives — is transitive closure, i.e. connected
components. The reference has no analogue (its dedup is per-event
exact matching); this is the standard large-corpus curation step.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014) — the
shuffle-based formulation that converges in O(log^2 n) rounds with
per-round cost O(|E|), never materializing a component in one task.
Each round is a groupBy (per-node min neighbor) plus a same-key join,
so at 100 TB it is bounded by shuffle bandwidth on the edge list;
lineage is truncated every round with localCheckpoint (on a cluster,
`spark.sparkContext.setCheckpointDir` + .checkpoint() is the
fault-tolerant variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _star_round(e: DataFrame) -> DataFrame:
    """One large-star + small-star round. `e` holds directed edges
    (u, v); output edges all point large→small (u > v)."""
    # large-star: every neighbor of u larger than u connects to u's
    # min neighbor (or u itself if u is the min)
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("mv", "u").alias("m"))
    )
    ls = (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )
    # small-star: every smaller neighbor of u (plus u) connects to u's
    # min smaller neighbor. ls edges already point large→small.
    mins2 = ls.groupBy("u").agg(F.min("v").alias("m"))
    relink = (
        ls.join(mins2, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    anchor = mins2.select("u", F.col("m").alias("v"))
    return relink.union(anchor).distinct()


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve an undirected pair list to components.

    Returns (node, root) with one row per distinct node in `pairs`,
    root = min node id of its component (the deterministic canonical
    representative). Converges when a round leaves the edge set
    unchanged (count + order-independent xxhash64 sum — a collision
    would need two edge sets agreeing on both); raises if `max_iter`
    rounds don't reach a fixpoint (components of diameter d need
    ~log d rounds, so 25 covers any realistic graph).
    """
    e = (
        pairs.select(
            F.col(a_col).cast("long").alias("u"), F.col(b_col).cast("long").alias("v")
        )
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v")))
        .distinct()
    )
    prev: tuple | None = None
    for _ in range(max_iter):
        e = _star_round(e).localCheckpoint()
        sig = e.agg(
            F.count("*").alias("n"),
            # decimal accumulator: a long sum of 64-bit hashes overflows
            # under ANSI mode
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        cur = (sig["n"], sig["h"])
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no fixpoint after {max_iter} rounds")
    # fixpoint is a star forest: every non-root points straight at its
    # component min; roots appear only on the v side
    return e.select(F.col("u").alias("node"), F.col("v").alias("root")).unionByName(
        e.select(F.col("v").alias("node"), F.col("v").alias("root")).distinct()
    )


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 25,
) -> DataFrame:
    """Near-dup clusters from a verified pair list: (doc_id,
    cluster_root, cluster_size). `cluster_root` (component min id) is
    the canonical survivor; everything else in the cluster is the
    drop set. Sizes come from one extra aggregation on the (tiny
    relative to the corpus) component mapping."""
    cc = connected_components(pairs, a_col, b_col, max_iter)
    sizes = cc.groupBy("root").agg(F.count("*").alias("cluster_size"))
    return (
        cc.join(sizes, "root")
        .select(
            F.col("node").alias("doc_id"),
            F.col("root").alias("cluster_root"),
            "cluster_size",
        )
    )
