"""DNSBL + geolocation derivation stages (plans/enrich.py): fixture-
fed fixtures stand in for the DNS/mmdb hops; the mechanics — reverse
query names, per-zone result mapping, CIDR range membership, LEFT
miss semantics — are pinned here."""

from __future__ import annotations

import pytest
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


def test_api_enrich_fetchers_over_loopback_http():
    """The per-entity API pullers (sources/apienrich.py): every HTTP
    status branch the reference modules handle — InternetDB 200/404/
    429-retry/500 (shodan.py:74-119), Passive DNS negative-record
    filtering + FQDN dot strip + non-200 skip + token redaction in
    error logs (passive_dns.py:108-134), CIRCL BGP POST body + rank
    parse + not-found-as-0.0 + error skip (bgp_rank.py:53-83)."""
    import http.server
    import json as _json
    import threading

    from nerd_spark.sources.apienrich import (
        fetch_bgp_rank,
        fetch_internetdb,
        fetch_passive_dns,
    )

    hits = {"n429": 0}
    posted = []

    class H(http.server.BaseHTTPRequestHandler):
        def _send(self, code, doc):
            body = _json.dumps(doc).encode()
            self.send_response(code)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/idb/1.2.3.4":
                self._send(200, {"ports": [22, 443], "tags": ["vpn"],
                                 "cpes": ["cpe:/a:openbsd:openssh"]})
            elif self.path == "/idb/1.2.3.5":
                self._send(404, {"detail": "No information available"})
            elif self.path == "/idb/1.2.3.6":
                hits["n429"] += 1
                if hits["n429"] <= 2:
                    self._send(429, {})
                else:
                    self._send(200, {"ports": [80]})
            elif self.path == "/idb/1.2.3.7":
                self._send(500, {})
            elif self.path.startswith("/pdns/ip/"):
                self._send(200, [
                    {"domain": "a.example."},
                    {"domain": "a.example."},      # dup from 2nd server
                    {"domain": "bad.example.", "reply": "NXDOMAIN"},
                    {"domain": "b.example."},
                    {"rrtype": "A"},               # no domain key
                ])
            else:
                self._send(404, {})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = _json.loads(self.rfile.read(n))
            posted.append(body)
            if body["asn"] == 65001:
                self._send(200, {"meta": {"asn": 65001},
                                 "response": {"asn_description": "X",
                                              "ranking": {"rank": 2.5,
                                                          "position": 10,
                                                          "total_known_asns": 99}}})
            else:  # unknown ASN: the API's not-found shape
                self._send(200, {"meta": {"asn": body["asn"]},
                                 "response": {"asn_description": "",
                                              "ranking": {"rank": 0.0,
                                                          "position": None,
                                                          "total_known_asns": 99}}})

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        idb = f"{base}/idb"
        # 200 -> found with the three arrays
        assert fetch_internetdb("1.2.3.4", idb) == {
            "ip": "1.2.3.4", "found": True, "ports": [22, 443],
            "tags": ["vpn"], "cpes": ["cpe:/a:openbsd:openssh"]}
        # 404 -> found=False (drives the remove branch)
        assert fetch_internetdb("1.2.3.5", idb)["found"] is False
        # 429 with the reference's retry budget (0) -> give up
        slept = []
        assert fetch_internetdb("1.2.3.6", idb, max_retries=0,
                                _sleep=slept.append) is None
        # 429 twice then 200 with budget 2 -> success after sleeping
        hits["n429"] = 0
        got = fetch_internetdb("1.2.3.6", idb, max_retries=2,
                               rate_limit_sleep=7, _sleep=slept.append)
        assert got["ports"] == [80] and slept == [7, 7]
        # unexpected status -> None (no update)
        assert fetch_internetdb("1.2.3.7", idb) is None

        # passive DNS: negatives dropped, dups collapsed, dot stripped
        doms = fetch_passive_dns("9.9.9.9", f"{base}/pdns/", token="sec")
        assert doms == ["a.example", "b.example"]
        # non-200 -> None
        assert fetch_passive_dns("9.9.9.9", f"{base}/nope/", token="sec") is None

        # connection error -> None, token redacted from the log line
        class Log:
            msg = None

            def error(self, m):
                self.msg = m

        log = Log()
        assert fetch_passive_dns("9.9.9.9", "http://127.0.0.1:1/x/",
                                 token="sec", log=log) is None
        assert "sec" not in log.msg and "<REDACTED>" in log.msg

        # BGP rank: POST body matches the reference's literal JSON
        assert fetch_bgp_rank(65001, f"{base}/bgp") == 2.5
        assert posted[-1] == {"asn": 65001, "address_family": "v4"}
        # not-found: rank 0.0 comes back and IS a value (stored)
        assert fetch_bgp_rank(64999, f"{base}/bgp") == 0.0
        # connection error -> None (no update)
        assert fetch_bgp_rank(65001, "http://127.0.0.1:1/bgp") is None
    finally:
        srv.shutdown()


@pytest.mark.slow
def test_shodan_and_pdns_ops_merge_roundtrip(spark):
    """The wire-format emitters feed operators/merge.py and land the
    reference's record shapes: set shodan.{ports,tags,cpes} builds the
    subtree, remove shodan pops it (shodan.py:84-118); dbl
    array_upsert inserts + appends history while array_update only
    touches existing entries (passive_dns.py:137-143)."""
    import json as _json

    from nerd_spark.operators.merge import merge_changelog
    from nerd_spark.plans.enrich import (
        passive_dns_decisions,
        passive_dns_ops,
        shodan_decisions,
        shodan_ops,
    )

    ents = spark.createDataFrame(
        [("ip1", False, True, False),   # fresh, found -> set
         ("ip2", True, True, True),     # weekly, long_active, 404 -> remove
         ("ip3", True, False, True),    # weekly short-lived -> skip
         ("ip4", False, True, False)],  # fetch failed (absent) -> none
        "entity string, had_shodan boolean, long_active boolean, weekly boolean",
    )
    snap = spark.createDataFrame(
        [("ip1", True, [22], ["vpn"], ["cpe:/a:x"]),
         ("ip2", False, None, None, None)],
        "ip string, found boolean, ports array<int>, tags array<string>, "
        "cpes array<string>",
    )
    dec = {r["entity"]: r["action"]
           for r in shodan_decisions(ents, snap).collect()}
    assert dec == {"ip1": "set", "ip2": "remove", "ip3": "skip",
                   "ip4": "none"}

    ops = shodan_ops(shodan_decisions(ents, snap))
    base = spark.createDataFrame(
        [("ip1", "{}"),
         ("ip2", _json.dumps({"shodan": {"ports": [1]}, "asn": 7}))],
        "eid string, record string",
    )
    merged = {r["eid"]: _json.loads(r["record"])
              for r in merge_changelog(base, ops).collect()}
    assert merged["ip1"]["shodan"] == {"ports": [22], "tags": ["vpn"],
                                       "cpes": ["cpe:/a:x"]}
    assert "shodan" not in merged["ip2"] and merged["ip2"]["asn"] == 7

    resolved = spark.createDataFrame(
        [("ip1", "a.example"), ("ip1", "b.example")],
        "entity string, domain string",
    )
    bl_meta = spark.createDataFrame(
        [("dbl1", "2024-01-01")], "blname string, t string"
    )
    bl_member = spark.createDataFrame(
        [("dbl1", "a.example")], "blname string, domain string"
    )
    pd_dec = passive_dns_decisions(resolved, bl_meta, bl_member)
    got = {(r["domain"], r["v"]) for r in pd_dec.collect()}
    assert got == {("a.example", 1), ("b.example", 0)}

    # record already tracks b.example (off-list update refreshes it);
    # a.example is new (upsert inserts + starts the history array)
    pd_base = spark.createDataFrame(
        [("ip1", _json.dumps({"dbl": [
            {"n": "dbl1", "d": "b.example", "v": 1, "t": "2023-12-31",
             "h": ["2023-12-31"]}]}))],
        "eid string, record string",
    )
    out = merge_changelog(pd_base, passive_dns_ops(pd_dec)).collect()
    rec = _json.loads(out[0]["record"])
    by_domain = {e["d"]: e for e in rec["dbl"]}
    assert by_domain["a.example"] == {
        "n": "dbl1", "d": "a.example", "v": 1, "t": "2024-01-01",
        "h": ["2024-01-01"]}
    # off-list: v flipped to 0, t refreshed, history NOT extended
    assert by_domain["b.example"]["v"] == 0
    assert by_domain["b.example"]["t"] == "2024-01-01"
    assert by_domain["b.example"]["h"] == ["2023-12-31"]


def test_api_enrich_stages_plan_shapes(spark):
    """bgp_rank_stage / passive_dns_decisions keep the enrichment
    family plan shape: the dim/catalogue sides broadcast, the entity
    frame never shuffles through the dim joins. passive_dns_decisions'
    MEMBERSHIP join is deliberately unhinted (r9: a domain blacklist
    can hold millions of entries, so size-based planning must keep its
    shuffle escape) — for it we assert the cross-join side broadcasts
    at compile time and that AQE's FINAL plan (post-execution) picks a
    broadcast join for this tiny membership table. (shodan_decisions
    joins two batch-sized frames and legitimately leaves the strategy
    to AQE — no assertion there.)"""
    from nerd_spark.plans.enrich import bgp_rank_stage, passive_dns_decisions

    asns = spark.createDataFrame([(1, 5)], "entity long, asn long")
    ranks = spark.createDataFrame(
        [(5, 2.5)], "asn long, circl_bgprank double"
    )
    resolved = spark.createDataFrame(
        [("ip1", "a.example")], "entity string, domain string"
    )
    bl_meta = spark.createDataFrame(
        [("dbl1", "2024-01-01")], "blname string, t string"
    )
    bl_member = spark.createDataFrame(
        [("dbl1", "a.example")], "blname string, domain string"
    )
    df = bgp_rank_stage(asns, ranks)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert (
        "BroadcastHashJoin" in plan
        or "BroadcastNestedLoopJoin" in plan
        or "BroadcastExchange" in plan
    )
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan

    pdns = passive_dns_decisions(resolved, bl_meta, bl_member)
    compile_plan = pdns._jdf.queryExecution().executedPlan().toString()
    # the catalogue cross is hinted (config-handful by construction)
    assert "BroadcastNestedLoopJoin" in compile_plan
    # the membership join is NOT force-broadcast: the compile plan may
    # carry exchanges; what matters is AQE's runtime choice
    pdns.collect()
    final_plan = pdns._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final_plan
    assert "BroadcastHashJoin" in final_plan  # AQE picked broadcast here
