"""DNSBL + geolocation derivation stages (plans/enrich.py): fixture-
fed fixtures stand in for the DNS/mmdb hops; the mechanics — reverse
query names, per-zone result mapping, CIDR range membership, LEFT
miss semantics — are pinned here."""

from __future__ import annotations

from pyspark.sql import functions as F

from nerd_spark.plans.enrich import (
    dnsbl_qnames,
    dnsbl_stage,
    geo_stage,
    parse_geolite_blocks,
)

_CFG = [
    ("bl.example.org", {"127.0.0.2": "spam", "127.0.0.3": "exploit"}),
    ("rbl.example.net", {"127.0.0.2": "policy"}),
]


def test_reverse_ip_matches_reference_examples(spark):
    """The documented examples from the reference's reverse_ip
    (NERDd/modules/dnsbl.py:74-88), v4 and exploded v6."""
    from nerd_spark.functions.ip import reverse_ip

    df = spark.createDataFrame(
        [("100.20.3.4",), ("2001:db8::1000",)], "ip string"
    )
    got = dict(df.select("ip", reverse_ip("ip").alias("r")).collect())
    assert got["100.20.3.4"] == "4.3.20.100"
    assert got["2001:db8::1000"] == (
        "0.0.0.1.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.8.b.d.0.1.0.0.2"
    )


def test_dnsbl_stage_fixture_resolver(spark):
    """Membership from a fixture answers table: multi-zone hits union,
    unknown rdata drops (the reference's bl[1].get(r.host, {})),
    NXDOMAIN (absent qname) means clean — and clean entities still
    get a row with bl=[]."""
    ips = spark.createDataFrame(
        [(1, "100.20.3.4"), (2, "10.0.0.9"), (3, "10.0.0.10")],
        "entity long, ip string",
    )
    q = dnsbl_qnames(ips, _CFG)
    assert q.count() == 6  # 3 ips x 2 zones
    qn = {
        (r.entity, r.zone): r.qname for r in q.collect()
    }
    assert qn[(1, "bl.example.org")] == "4.3.20.100.bl.example.org"

    answers = spark.createDataFrame(
        [
            ("4.3.20.100.bl.example.org", "127.0.0.2"),   # spam
            ("4.3.20.100.bl.example.org", "127.0.0.3"),   # exploit (2 A recs)
            ("4.3.20.100.rbl.example.net", "127.0.0.2"),  # policy
            ("9.0.0.10.bl.example.org", "127.0.0.9"),     # unknown rdata
            ("9.0.0.10.rbl.example.net", "127.0.0.3"),    # unknown for zone
        ],
        "qname string, rdata string",
    )
    out = {r.entity: list(r.bl) for r in dnsbl_stage(ips, answers, _CFG).collect()}
    assert out == {1: ["exploit", "policy", "spam"], 2: [], 3: []}


def test_geolite_block_parse_and_range_membership(spark):
    """CIDR parse arithmetic and boundary membership: first/last
    address of a block hit, the next address misses; an IP outside
    every block keeps NULL geo (AddressNotFoundError semantics)."""
    blocks = spark.createDataFrame(
        [("10.1.0.0/16", 7), ("192.168.4.0/22", 8)],
        "network string, geoname_id int",
    )
    parsed = {r.geoname_id: (r.ip_from, r.ip_to) for r in parse_geolite_blocks(blocks).collect()}
    assert parsed[7] == (167837696, 167903231)  # 10.1.0.0 .. 10.1.255.255
    assert parsed[8][1] - parsed[8][0] == 1024 - 1

    locations = spark.createDataFrame(
        [(7, "CZ", "Praha", "Europe/Prague"), (8, "DE", "Berlin", "Europe/Berlin")],
        "geoname_id int, country_iso_code string, city_name string, time_zone string",
    )
    ips = spark.createDataFrame(
        [
            (1, 167837696),       # 10.1.0.0   first addr of block 7
            (2, 167903231),       # 10.1.255.255 last addr of block 7
            (3, 167903232),       # 10.2.0.0   just past -> miss
            (4, 3232236544 + 5),  # 192.168.4.5 -> block 8
        ],
        "entity long, ip_int long",
    )
    out = {r.entity: (r.geo_ctry, r.geo_city, r.geo_tz)
           for r in geo_stage(ips, blocks, locations).collect()}
    assert out[1] == ("CZ", "Praha", "Europe/Prague")
    assert out[2] == ("CZ", "Praha", "Europe/Prague")
    assert out[3] == (None, None, None)
    assert out[4] == ("DE", "Berlin", "Europe/Berlin")


def test_enrich_stages_are_broadcast_plans(spark):
    """Both stages must plan broadcast joins on the lookup side — no
    shuffle of the big entity frame (the 100 TB shape: lookups are
    config/dim-sized)."""
    ips = spark.createDataFrame([(1, "1.2.3.4")], "entity long, ip string")
    answers = spark.createDataFrame(
        [("4.3.2.1.bl.example.org", "127.0.0.2")], "qname string, rdata string"
    )
    plan = (
        dnsbl_stage(ips, answers, _CFG)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    blocks = spark.createDataFrame([("10.0.0.0/8", 1)], "network string, geoname_id int")
    locations = spark.createDataFrame(
        [(1, "CZ", "P", "Z")],
        "geoname_id int, country_iso_code string, city_name string, time_zone string",
    )
    ips2 = spark.createDataFrame([(1, 167772161)], "entity long, ip_int long")
    plan2 = (
        geo_stage(ips2, blocks, locations)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan2 or "BroadcastExchange" in plan2


def test_ptr_hostname_stage_fixture_resolver(spark):
    """PTR semantics from the reference's dns.py: trailing-dot trim,
    NULL on absent qname (NXDOMAIN/timeout), deterministic-first
    collapse of multi-record answers, broadcast answers join."""
    from nerd_spark.plans.enrich import ptr_hostname_stage

    ips = spark.createDataFrame(
        [(1, "100.20.3.4"), (2, "10.0.0.9"), (3, "192.0.2.42")],
        "entity long, ip string",
    )
    answers = spark.createDataFrame(
        [
            ("4.3.20.100.in-addr.arpa", "web.example.com."),
            # entity 2: two PTR records -> min(rdata) wins
            ("9.0.0.10.in-addr.arpa", "mail.example.org."),
            ("9.0.0.10.in-addr.arpa", "alpha.example.org."),
        ],
        "qname string, rdata string",
    )
    out = ptr_hostname_stage(ips, answers)
    got = {r.entity: r.hostname for r in out.collect()}
    assert got == {
        1: "web.example.com",
        2: "alpha.example.org",
        3: None,
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_parse_caida_lines_drops_comments_and_bad_asn(spark):
    """parse_list semantics (reference caida_as_class.py:54-77):
    '#' comments skipped, non-numeric asn logged-and-skipped, the
    rest split on '|'."""
    from nerd_spark.plans.enrich import parse_caida_lines

    lines = spark.createDataFrame(
        [
            ("# as2types CAIDA file",),
            ("15169|mlp|Content",),
            ("ASXX|bad|line",),
            ("64500|self|Transit/Access",),
        ],
        "line string",
    )
    rows = {r.asn: (r.source, r.cls) for r in parse_caida_lines(lines).collect()}
    assert rows == {
        15169: ("mlp", "Content"),
        64500: ("self", "Transit/Access"),
    }


def test_as_class_stage_remap_confidence_and_unknown(spark):
    """determine_type semantics (caida_as_class.py:100-127): class
    value remapped through config, confidence stored ONLY when != 1,
    unknown ASN stores literal 'unknown'."""
    from nerd_spark.plans.enrich import as_class_stage

    asns = spark.createDataFrame(
        [(1, 15169), (2, 64500), (3, 999)], "entity long, asn long"
    )
    caida = spark.createDataFrame(
        [(15169, "mlp", "Content"), (64500, "self", "Transit/Access")],
        "asn long, source string, cls string",
    )
    out = {
        r.entity: (r.as_class_v, r.as_class_c)
        for r in as_class_stage(
            asns,
            caida,
            class_values={"Transit/Access": "access"},
            source_confidence={"mlp": 0.5},
        ).collect()
    }
    assert out == {
        1: ("Content", 0.5),   # confidence != 1 -> stored
        2: ("access", None),   # remapped class, confidence 1 -> NULL
        3: ("unknown", None),  # miss -> literal 'unknown'
    }


def test_reserved_ip_stage_range_membership(spark):
    """is_reserved semantics (reserved_ip.py:41-75) over the int-range
    formulation: one representative inside each tricky range (CGN /10,
    172.16/12, 198.18/15 — the ref's typo'd regex — and multicast),
    plus publics just outside the boundaries."""
    from nerd_spark.plans.enrich import reserved_ip_stage

    def ip4(s):
        a, b, c, d = (int(x) for x in s.split("."))
        return (a << 24) | (b << 16) | (c << 8) | d

    cases = {
        "9.255.255.255": 0,
        "10.0.0.1": 1,
        "100.63.255.255": 0,
        "100.64.0.0": 1,
        "100.127.255.255": 1,
        "100.128.0.0": 0,
        "172.15.255.255": 0,
        "172.16.0.0": 1,
        "172.31.255.255": 1,
        "172.32.0.0": 0,
        "198.17.255.255": 0,
        "198.18.0.1": 1,
        "198.19.255.255": 1,
        "198.20.0.0": 0,
        "203.0.113.7": 1,
        "203.0.114.0": 0,
        "223.255.255.255": 0,
        "224.0.0.0": 1,
        "255.255.255.255": 1,
    }
    ips = spark.createDataFrame(
        [(i, ip4(s)) for i, s in enumerate(cases)], "entity long, ip_int long"
    )
    got = {
        r.entity: r.reserved_range
        for r in reserved_ip_stage(ips).collect()
    }
    for i, (s, want) in enumerate(cases.items()):
        assert got[i] == want, s


def test_asn_rank_stage_left_miss(spark):
    """get_rank semantics (eml_asn_rank.py:38-68): rank as double from
    the snapshot dim; an ASN absent from the snapshot stores nothing
    (NULL here)."""
    from nerd_spark.plans.enrich import asn_rank_stage

    asns = spark.createDataFrame([(1, 100), (2, 200)], "entity long, asn long")
    ranks = spark.createDataFrame([(100, 0.25)], "asn long, rank double")
    out = {r.entity: r.eml_rank for r in asn_rank_stage(asns, ranks).collect()}
    assert out == {1: 0.25, 2: None}


def test_new_enrich_stages_are_broadcast_plans(spark):
    """The r8 stages keep the family plan shape: broadcast on the
    dim/literal side, never a shuffle of the entity frame."""
    from nerd_spark.plans.enrich import (
        as_class_stage,
        asn_rank_stage,
        reserved_ip_stage,
    )

    asns = spark.createDataFrame([(1, 5)], "entity long, asn long")
    caida = spark.createDataFrame(
        [(5, "s", "Content")], "asn long, source string, cls string"
    )
    ranks = spark.createDataFrame([(5, 1.0)], "asn long, rank double")
    ips = spark.createDataFrame([(1, 167772161)], "entity long, ip_int long")
    for df in (
        as_class_stage(asns, caida),
        asn_rank_stage(asns, ranks),
        reserved_ip_stage(ips),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert (
            "BroadcastHashJoin" in plan
            or "BroadcastNestedLoopJoin" in plan
            or "BroadcastExchange" in plan
        )
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan


def test_reserved_ranges_match_reference_semantics_property(spark):
    """Property (random IPs): reserved_ip_stage agrees with a faithful
    re-implementation of the reference's matcher (reserved_ip.py:
    prefix list + range regexes, INCLUDING its quirks) everywhere
    except the single documented divergence — 198.18.0.0/15, where the
    reference's regex carries a stray ']' and can never match, while
    the range is intentionally reserved (RFC 2544)."""
    import random
    import re

    prefixes = ["0.", "10.", "127.", "169.254.", "192.0.0.", "192.0.2.",
                "192.168.", "198.51.100.", "203.0.113.", "255.255.255.255"]
    regexes = [
        re.compile(r"100\.(6[4-9]|[7-9][0-9]|1[0-1][0-9]|12[0-7])\.\d{1,3}\.\d{1,3}"),
        re.compile(r"172\.(1[6-9]|2[0-9]|3[0-1])\.\d{1,3}\.\d{1,3}"),
        re.compile(r"198\.1[8-9]\.\d{1,3}\.\d{1,3}]"),  # ref's typo kept
        re.compile(r"2(2[4-9]|[3-4][0-9]|5[0-5])\.\d{1,3}\.\d{1,3}\.\d{1,3}"),
    ]

    def ref_is_reserved(ip: str) -> int:
        for p in prefixes:
            if ip.startswith(p):
                return 1
        for rx in regexes:
            if rx.search(ip):
                return 1
        return 0

    rnd = random.Random(8)
    ips = [
        ".".join(str(rnd.randrange(256)) for _ in range(4)) for _ in range(400)
    ]
    # force coverage of the divergent and boundary-rich ranges
    ips += ["198.18.5.5", "198.19.255.1", "100.64.3.3", "172.20.0.1",
            "169.254.9.9", "203.0.113.200", "224.1.2.3", "239.9.9.9"]

    def ip4(s):
        a, b, c, d = (int(x) for x in s.split("."))
        return (a << 24) | (b << 16) | (c << 8) | d

    from nerd_spark.plans.enrich import reserved_ip_stage

    frame = spark.createDataFrame(
        [(i, ip4(s)) for i, s in enumerate(ips)], "entity long, ip_int long"
    )
    got = {r.entity: r.reserved_range for r in reserved_ip_stage(frame).collect()}
    diverged = []
    for i, s in enumerate(ips):
        want = ref_is_reserved(s)
        if got[i] != want:
            diverged.append(s)
    # every divergence must be inside 198.18.0.0/15 (ours=1, ref's
    # typo'd regex=0) — anything else is a real bug
    for s in diverged:
        a, b = (int(x) for x in s.split(".")[:2])
        assert a == 198 and b in (18, 19), f"unexpected divergence at {s}"
        assert got[ips.index(s)] == 1
