"""Entity-graph tests over FIXTURES.md §4-shaped dims."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nerd_spark.plans.entity_graph import enrich_ips, ips_in_asn, rebuild_ref_counts


@pytest.fixture(scope="module")
def graph(spark):
    ip = spark.createDataFrame(
        [
            (1, "192.0.2.0/24", "blk1"),
            (2, "192.0.2.0/24", "blk1"),
            (3, "198.51.100.0/24", "blk2"),
            (4, None, None),
        ],
        "_id long, bgppref string, ipblock string",
    )
    bgppref = spark.createDataFrame(
        [
            ("192.0.2.0/24", 0.5, [64500, 64501], 99),  # stale _ref_cnt on purpose
            ("198.51.100.0/24", 0.1, [64501], 99),
            ("203.0.113.0/24", 0.0, [64502], 99),  # unreferenced
        ],
        "_id string, rep double, asn array<long>, _ref_cnt long",
    )
    asn = spark.createDataFrame(
        [
            (64500, "AS-A", "org1", ["stale"]),
            (64501, "AS-B", "org1", ["stale"]),
            (64502, "AS-C", None, ["stale"]),
        ],
        "_id long, name string, org string, bgppref array<string>",
    )
    ipblock = spark.createDataFrame(
        [("blk1", "org2", "ripe", 99), ("blk2", None, "arin", 99)],
        "_id string, org string, rir string, _ref_cnt long",
    )
    org = spark.createDataFrame(
        [("org1", "Org One", 99), ("org2", "Org Two", 99)],
        "_id string, name string, _ref_cnt long",
    )
    return dict(ip=ip, bgppref=bgppref, asn=asn, ipblock=ipblock, org=org)


def test_enrich_m2n_hop(graph):
    out = enrich_ips(graph["ip"], graph["bgppref"], graph["asn"], graph["ipblock"], graph["org"])
    rows = [(r._id, r.asn_id, r.asn_name, r.block_org, r.org_name) for r in out.collect()]
    # ip 1 fans out to both origin ASNs of its prefix
    by_ip = {}
    for _id, asn_id, asn_name, block_org, org_name in rows:
        by_ip.setdefault(_id, set()).add((asn_id, asn_name, org_name))
    assert by_ip[1] == {(64500, "AS-A", "Org One"), (64501, "AS-B", "Org One")}
    assert by_ip[3] == {(64501, "AS-B", "Org One")}
    assert by_ip[4] == {(None, None, None)}  # unmapped IP passes through


def test_ref_count_rebuild(graph):
    out = rebuild_ref_counts(graph["ip"], graph["bgppref"], graph["ipblock"], graph["org"], graph["asn"])
    bp = {r._id: r._ref_cnt for r in out["bgppref"].collect()}
    assert bp == {"192.0.2.0/24": 2, "198.51.100.0/24": 1, "203.0.113.0/24": 0}
    blk = {r._id: r._ref_cnt for r in out["ipblock"].collect()}
    assert blk == {"blk1": 2, "blk2": 1}
    asn_ptrs = {r._id: r.bgppref for r in out["asn"].collect()}
    assert asn_ptrs[64501] == ["192.0.2.0/24", "198.51.100.0/24"]
    assert asn_ptrs[64502] == ["203.0.113.0/24"]
    orgs = {r._id: r._ref_cnt for r in out["org"].collect()}
    assert orgs == {"org1": 2, "org2": 1}  # org1: 2 ASNs; org2: 1 block


def test_asn_semijoin(graph):
    # rebuild pointers first (the stale fixture arrays are wrong on purpose)
    asn = rebuild_ref_counts(
        graph["ip"], graph["bgppref"], graph["ipblock"], graph["org"], graph["asn"]
    )["asn"]
    got = sorted(r._id for r in ips_in_asn(graph["ip"], asn, 64500).collect())
    assert got == [1, 2]
    got2 = sorted(r._id for r in ips_in_asn(graph["ip"], asn, 64501).collect())
    assert got2 == [1, 2, 3]


@pytest.mark.slow
def test_delete_cascade_converges_to_rebuild(spark):
    """Property (VERDICT r2 #7): after a random sequence of IP record
    deletions, the incremental cascade's counts, pointer arrays and
    survivor sets equal a ground-truth rebuild over the remaining IPs
    (reference: whois.py:239-296 decrements vs fix_ref_cnt.js)."""
    import random

    from nerd_spark.plans.entity_graph import cascade_deletes

    for seed in (7, 23, 91):
        rng = random.Random(seed)
        n_org, n_asn, n_blk, n_bp, n_ip = 4, 6, 5, 8, 30
        orgs = [f"org{i}" for i in range(n_org)]
        asns = [
            (64500 + i, f"AS-{i}", rng.choice(orgs + [None]))
            for i in range(n_asn)
        ]
        blks = [
            (f"blk{i}", rng.choice(orgs + [None]), "ripe")
            for i in range(n_blk)
        ]
        bps = [
            (
                f"10.{i}.0.0/16",
                round(rng.random(), 3),
                sorted(rng.sample([a[0] for a in asns], rng.randint(1, 3))),
            )
            for i in range(n_bp)
        ]
        ips = [
            (
                i,
                rng.choice([b[0] for b in bps] + [None]),
                rng.choice([b[0] for b in blks] + [None]),
            )
            for i in range(n_ip)
        ]
        ip = spark.createDataFrame(ips, "_id long, bgppref string, ipblock string")
        bgppref = spark.createDataFrame(
            [(i, r, a, 0) for i, r, a in bps],
            "_id string, rep double, asn array<long>, _ref_cnt long",
        )
        asn = spark.createDataFrame(
            [(i, n, o, None) for i, n, o in asns],
            "_id long, name string, org string, bgppref array<string>",
        )
        ipblock = spark.createDataFrame(
            [(i, o, r, 0) for i, o, r in blks],
            "_id string, org string, rir string, _ref_cnt long",
        )
        org = spark.createDataFrame(
            [(o, o.upper(), 0) for o in orgs], "_id string, name string, _ref_cnt long"
        )

        # ground-truth initial state: counts + pointer arrays rebuilt
        init = rebuild_ref_counts(ip, bgppref, ipblock, org, asn)

        doomed = rng.sample(range(n_ip), rng.randint(5, 20))
        deleted = ip.filter(F.col("_id").isin(doomed))
        remaining = ip.filter(~F.col("_id").isin(doomed))

        got = cascade_deletes(
            deleted, init["bgppref"], init["ipblock"], init["org"], init["asn"]
        )
        want = rebuild_ref_counts(
            remaining, got["bgppref"], got["ipblock"], got["org"], got["asn"]
        )

        # survivor sets are exactly ground truth:
        live_bp = {
            r.bgppref for r in remaining.collect() if r.bgppref is not None
        }
        had_ref = {r.bgppref for r in ip.collect() if r.bgppref is not None}
        got_bp = {r._id for r in got["bgppref"].collect()}
        # dead == referenced-before but unreferenced-now
        assert got_bp == {b for b, *_ in bps} - (had_ref - live_bp)
        live_blk = {r.ipblock for r in remaining.collect() if r.ipblock is not None}
        had_blk = {r.ipblock for r in ip.collect() if r.ipblock is not None}
        got_blk = {r._id for r in got["ipblock"].collect()}
        assert got_blk == {b for b, *_ in blks} - (had_blk - live_blk)

        # counts + arrays equal the rebuild over remaining IPs
        assert {r._id: r._ref_cnt for r in got["bgppref"].collect()} == {
            r._id: r._ref_cnt for r in want["bgppref"].collect()
        }
        assert {r._id: r._ref_cnt for r in got["ipblock"].collect()} == {
            r._id: r._ref_cnt for r in want["ipblock"].collect()
        }
        assert {r._id: r._ref_cnt for r in got["org"].collect()} == {
            r._id: r._ref_cnt for r in want["org"].collect()
        }
        got_ptrs = {r._id: (r.bgppref or []) for r in got["asn"].collect()}
        want_ptrs = {r._id: (r.bgppref or []) for r in want["asn"].collect()}
        assert got_ptrs == want_ptrs
