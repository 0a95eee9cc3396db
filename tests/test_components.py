"""Connected-components operator: property-checked against a driver-
side union-find on random graphs, plus the worst-case shapes (long
chain, star, empty)."""

from __future__ import annotations

import random

from nerd_spark.operators.components import connected_components, dedup_clusters


def _union_find(n_nodes, edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {(r.node, r.root) for r in connected_components(df).collect()}
    want = set(_union_find(None, edges).items())
    assert got == want


def test_cc_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(40 + 20 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, edges)


def test_cc_long_chain(spark):
    # path graph 0-1-2-...-40: diameter 40 exercises the O(log n)
    # round convergence (min-label propagation would need 40 rounds)
    edges = [(i, i + 1) for i in range(40)]
    _check(spark, edges)


def test_cc_two_stars_bridged(spark):
    # two stars whose leaves share a bridge edge must merge into one
    # component rooted at the global min
    edges = [(0, i) for i in range(1, 6)] + [(100, 100 + i) for i in range(1, 6)]
    edges.append((5, 105))
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    roots = {r.root for r in connected_components(df).collect()}
    assert roots == {0}


def test_cc_empty(spark):
    df = spark.createDataFrame([], "a_id long, b_id long")
    assert connected_components(df).count() == 0


def test_dedup_clusters_sizes(spark):
    # {1,2,3} via chain, {10,11} pair -> sizes 3 and 2, root = min
    df = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "a_id long, b_id long"
    )
    rows = {
        (r.doc_id, r.cluster_root, r.cluster_size)
        for r in dedup_clusters(df).collect()
    }
    assert rows == {
        (1, 1, 3), (2, 1, 3), (3, 1, 3), (10, 10, 2), (11, 10, 2),
    }


def test_cc_multi_partition_contraction(spark, monkeypatch):
    # Force the p>1 path: shrink the per-partition edge budget so the
    # contraction spans several partitions and the star loop has to
    # finish the merge across partial (partition-local) star forests.
    import nerd_spark.operators.components as C

    monkeypatch.setattr(C, "_EDGES_PER_PARTITION", 8)
    rng = random.Random(7)
    n = 80
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    # duplicates on purpose: entry no longer dedups
    edges += edges[:15]
    _check(spark, edges)


def test_span_dedup_planted_boilerplate(spark):
    """Planted 10-token boilerplate block shared by two docs is
    removed from both; unique blocks survive in order; a doc made
    ENTIRELY of boilerplate keeps an empty kept_text."""
    from nerd_spark.operators.dedup import span_dedup

    boiler = "one two three four five six seven eight nine ten"
    uniq_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    uniq_b = "red orange yellow green blue indigo violet black white gray"
    docs = spark.createDataFrame(
        [
            (1, f"{uniq_a} {boiler}"),
            (2, f"{boiler} {uniq_b}"),
            (3, boiler),
            (4, uniq_a.replace("alpha", "ALPHA")),  # near-miss: kept
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in span_dedup(docs, k=10).collect()}
    assert out[1].n_blocks == 2 and out[1].n_removed == 1
    assert out[1].kept_text == uniq_a
    assert out[2].kept_text == uniq_b
    assert out[3].n_removed == 1 and out[3].kept_text == ""
    assert out[4].n_removed == 0 and out[4].kept_text == uniq_a.replace("alpha", "ALPHA")


def test_new_ops_edge_inputs(spark):
    """Degenerate inputs: empty texts produce no span blocks; a tiny
    corpus still clusters for semantic dedup; gopher rules flag
    everything false-but-healthy on junk."""
    from nerd_spark.ml.quality import gopher_rules
    from nerd_spark.operators.dedup import span_dedup
    from nerd_spark.operators.similarity import semantic_dedup

    empty_docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one two")], "doc_id long, text string"
    )
    out = span_dedup(empty_docs, k=10).collect()
    # "" splits to one empty token -> one (empty) block; whitespace
    # likewise; both land in the same fingerprint group as expected —
    # no crash, deterministic rows
    assert {r.doc_id for r in out} <= {1, 2, 3}

    g = {r.doc_id: r for r in gopher_rules(empty_docs).collect()}
    assert not g[1].keep and not g[3].keep  # too short on every front

    # centroids are ids 0/1 (orthogonal); the near-identical pair 2/3
    # assigns to cluster 0 and is found there; 4 (near centroid 1) is
    # alone in its cluster -> no cross-cluster comparison ever happens
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (2, [0.9, 0.1]),
            (3, [0.92, 0.08]),
            (4, [0.1, 0.9]),
        ],
        "vec_id long, embedding array<double>",
    )
    pairs = semantic_dedup(vecs, n_lists=2, threshold=0.95).collect()
    got = {(r.a_id, r.b_id) for r in pairs}
    assert (2, 3) in got  # near-identical pair found within cluster
    assert not any({a, b} == {2, 4} or {a, b} == {3, 4} for a, b in got)
    assert all(a < b for a, b in got)
