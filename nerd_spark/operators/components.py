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

Driver-loop cost model (the measured killer was fixed overhead, not
data): the star rounds are preceded by a PARTITION-LOCAL UNION-FIND
CONTRACTION — edges repartition once at a width sized from the
measured edge count (~4M edges / 64 MB per task), then an ints-only
mapInPandas task contracts each partition's subgraph to a min-rooted
star forest. That preserves global connectivity exactly (the emitted
star edges connect the same node sets the partition's edges did)
while shrinking the edge list the star rounds must iterate on; when
the sized graph fits ONE partition — near-dup graphs are tiny
relative to the corpus — the contraction is already the global answer
and the whole resolution is two jobs instead of ~10 (measured 19 s →
<2 s on a 256-edge sf0.1 graph). Remaining star rounds also issue
every shuffle as an explicit ``repartition(p, keys)`` sized from the
per-round signature count: hash-partitioning on the grouping/join
keys satisfies the downstream distribution requirement, so groupBys
and joins reuse the exchange instead of re-shuffling at
``spark.sql.shuffle.partitions`` (the localCheckpoint conversion
bypasses AQE coalescing, so late tiny rounds would otherwise pay
fixed 64-task stage waves). At scale the width saturates at the
session's shuffle width, i.e. the plan is unchanged where it matters.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

# Target edges per shuffle partition when sizing rounds: 4M edges of
# (long, long) ≈ 64 MB — the same advisory size AQE coalesces to.
_EDGES_PER_PARTITION = 4_000_000


def _local_cc(batches: Iterator) -> Iterator:
    """Partition-local union-find contraction (mapInPandas body).

    Consumes one partition's edges, emits (node, root) with root = min
    node id of the node's component *within this partition* and no
    self rows. Valid contraction: the emitted star edges connect
    exactly the node sets the partition's edges connected, so global
    connectivity is preserved while the edge count can only shrink.
    Ints-only Python (the sequence-packing rule: no text/payload ever
    crosses into the Python worker); bounded by the repartition width
    chosen from the measured edge count (≤ ~4M edges per task).
    """
    import pandas as pd

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for pdf in batches:
        for u, v in zip(pdf["u"].to_numpy(), pdf["v"].to_numpy()):
            u, v = int(u), int(v)
            if u not in parent:
                parent[u] = u
            if v not in parent:
                parent[v] = v
            ru, rv = find(u), find(v)
            if ru != rv:
                # union by min id: the smaller root stays root, so the
                # fixpoint is the same min-rooted star forest the
                # large/small-star rounds converge to
                if ru < rv:
                    parent[rv] = ru
                else:
                    parent[ru] = rv
    nodes = list(parent)
    roots = [find(x) for x in nodes]
    out = pd.DataFrame({"u": nodes, "v": roots}, dtype="int64")
    yield out[out["u"] != out["v"]]


def _star_round(e: DataFrame, p: int) -> DataFrame:
    """One large-star + small-star round at shuffle width `p`. `e`
    holds directed edges (u, v); output edges all point large→small
    (u > v)."""
    # large-star: every neighbor of u larger than u connects to u's
    # min neighbor (or u itself if u is the min)
    sym = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .repartition(p, "u")
    )
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("mv", "u").alias("m"))
    )
    ls = (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .repartition(p, "u", "v")
        .dropDuplicates()
        .repartition(p, "u")
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
    return (
        relink.union(anchor)
        .repartition(p, "u", "v")
        .dropDuplicates()
    )


def _width(n_edges: int, p_max: int) -> int:
    """Shuffle width for a round over `n_edges` edges."""
    return max(1, min(p_max, (n_edges + _EDGES_PER_PARTITION - 1) // _EDGES_PER_PARTITION))


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
    spark = pairs.sparkSession
    p_max = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    e = (
        pairs.select(
            F.col(a_col).cast("long").alias("u"), F.col(b_col).cast("long").alias("v")
        )
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v")))
        .localCheckpoint()
    )
    # Size the contraction from the materialized edge list (the
    # checkpoint already paid the one pass over the pair generator's
    # output). No entry dedup: union-find is idempotent over duplicate
    # edges and the star rounds dedupe internally, so paying a wide
    # distinct shuffle here buys nothing (duplicates only overcount
    # the width estimate, which errs large = safe).
    n = e.count()
    p = _width(n, p_max)
    # Phase 1 — partition-local contraction: one shuffle + one
    # executor-side union-find pass replaces the first (most
    # expensive) star rounds. When the sized graph fits one partition
    # the contraction IS the answer (that single task saw every edge
    # and unions by min id), so the whole resolution is two jobs.
    e = (
        e.repartition(p, "u")
        .mapInPandas(_local_cc, "u long, v long")
        .localCheckpoint()
    )
    if p > 1:
        e = _star_loop(e, e.count(), p_max, max_iter)
    # fixpoint is a star forest: every non-root points straight at its
    # component min; roots appear only on the v side
    return e.select(F.col("u").alias("node"), F.col("v").alias("root")).unionByName(
        e.select(F.col("v").alias("node"), F.col("v").alias("root")).distinct()
    )


def _star_loop(e: DataFrame, n: int, p_max: int, max_iter: int) -> DataFrame:
    """Alternate star rounds until the edge-set signature fixpoint."""
    prev: tuple | None = None
    for _ in range(max_iter):
        e = _star_round(e, _width(n, p_max)).localCheckpoint()
        sig = e.agg(
            F.count("*").alias("n"),
            # decimal accumulator: a long sum of 64-bit hashes overflows
            # under ANSI mode
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        n = sig["n"] or 0
        cur = (n, sig["h"])
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no fixpoint after {max_iter} rounds")
    return e


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
