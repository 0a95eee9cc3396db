"""DNSBL + geolocation + PTR-hostname derivation stages (SURVEY §2.9
plugin family).

The reference's enrichment modules are per-record external lookups:

- DNSBL (reference: NERDd/modules/dnsbl.py:160-230): for each new IP,
  query ``reverse_ip(ip) + '.' + zone`` against every configured
  blacklist zone; each DNS answer (an ``127.0.0.x`` A record) maps
  through the zone's result table to a blacklist id, appended to the
  record as ``bl.<id>``.
- Geolocation (reference: NERDd/modules/geolocation.py:56-91): look
  the IP up in MaxMind GeoLite2 and set geo.ctry/geo.city/geo.tz,
  leaving the record untouched when the address is unknown.
- Reverse DNS (reference: NERDd/modules/dns.py:43-81): PTR query on
  the in-addr.arpa reverse name, storing ``hostname`` (or None on
  NXDOMAIN/timeout).

Re-expressed as dataset-level derivation stages (the plans/derivations
discipline — pure DataFrame -> DataFrame, deterministic, one Catalyst
plan per pass):

- the DNS transport becomes an **answers table** (qname -> rdata): in
  production a resolver fan-out materializes it per batch (the S2/S4
  fetch seams); here the tests feed fixtures. The DNSBL *mechanics* —
  reverse-name construction, per-zone result mapping, per-entity set
  aggregation — are real column expressions.
- the GeoLite2 mmdb becomes its **public CSV layout** (blocks:
  network CIDR -> geoname_id; locations: geoname_id -> country/city/
  tz): a CIDR parse + range join (the J4 shape) + broadcast dim join.

Scale: the qname build is map-only (|ips| x |zones| rows, zones are a
config handful); the answers join shuffles on qname only when the
answers table is large (a resolver batch is small -> broadcast). The
geo blocks table is ~3M rows at full GeoLite size — broadcast still
fits (<100 MB), and past that the bucketed range join
(operators/rangejoin.py, j4_range_join_bucketed) is the drop-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nerd_spark.functions.ip import ipstr2int, reverse_ip

# blacklist config shape (reference etc/dns_blacklists.yml): a list of
# (zone, {answer_ip -> blacklist_id})
BlacklistCfg = list[tuple[str, dict[str, str]]]


def dnsbl_qnames(ips: DataFrame, blacklists: BlacklistCfg,
                 ip_col: str = "ip") -> DataFrame:
    """(entity, ip) -> one row per (entity, zone) with the DNSBL query
    name ``reverse_ip(ip).zone`` — the map-only fan-out a resolver
    batch consumes. Zones come from config, so the explode is over a
    broadcast-sized literal array."""
    zones = F.array(*[F.lit(z) for z, _ in blacklists])
    return ips.select(
        "entity",
        F.col(ip_col).alias("ip"),
        F.explode(zones).alias("zone"),
    ).withColumn(
        "qname", F.concat(reverse_ip("ip"), F.lit("."), F.col("zone"))
    )


def dnsbl_stage(
    ips: DataFrame,
    answers: DataFrame,
    blacklists: BlacklistCfg,
    ip_col: str = "ip",
) -> DataFrame:
    """Per-entity blacklist membership from a DNS answers table.

    ips: (entity, ip string); answers: (qname, rdata) — one row per A
    record a resolver returned (absent qname == NXDOMAIN == not
    listed). Output: (entity, bl: sorted array<string> of blacklist
    ids) — one row per entity, [] when clean; the ``bl.<id>`` append
    set of the reference handler.

    The (zone, rdata) -> id mapping is config-bounded, so it compiles
    to a literal CASE chain (JVM-side); unknown rdata values are
    dropped exactly like the reference's ``bl[1].get(r.host, {})``.
    """
    q = dnsbl_qnames(ips, blacklists, ip_col)
    joined = q.join(F.broadcast(answers), "qname")
    mapping = None
    for zone, results in blacklists:
        for rdata, bl_id in results.items():
            cond = (F.col("zone") == zone) & (F.col("rdata") == rdata)
            mapping = (
                F.when(cond, bl_id) if mapping is None else mapping.when(cond, bl_id)
            )
    if mapping is None:  # no zones / all result maps empty: all clean
        mapping = F.lit(None).cast("string")
    hits = joined.withColumn("bl_id", mapping).filter(F.col("bl_id").isNotNull())
    listed = hits.groupBy("entity").agg(
        F.array_sort(F.collect_set("bl_id")).alias("bl")
    )
    return (
        ips.select("entity")
        .distinct()
        .join(listed, "entity", "left")
        .withColumn("bl", F.coalesce("bl", F.array().cast("array<string>")))
    )


def ptr_hostname_stage(
    ips: DataFrame, answers: DataFrame, ip_col: str = "ip"
) -> DataFrame:
    """Reverse-DNS hostname resolution as a derivation stage
    (reference: NERDd/modules/dns.py:43-81 — the last enrichment
    module in the pure-data family).

    ips: (entity, ip string); answers: (qname, rdata) — one row per
    PTR record a resolver returned for ``reverse_ip(ip).in-addr.arpa``
    (the dns.reversename.from_address shape). Output:
    (entity, hostname) with the reference's exact semantics:

    - trailing ``.`` trimmed from the answer (dns.py:70-71);
    - NXDOMAIN / timeout / absent qname -> hostname NULL
      (dns.py:73-78 stores None);
    - multiple PTR records collapse to the deterministic first
      (min rdata) — the reference takes ``rrset[0]``.

    The DNS transport is the answers table (resolver batches are
    small -> broadcast); the qname build is map-only.
    """
    first = answers.groupBy("qname").agg(F.min("rdata").alias("rdata"))
    # v4 reverses under in-addr.arpa, v6 (nibble form from reverse_ip)
    # under ip6.arpa — dns.reversename.from_address's exact behavior
    suffix = F.when(
        F.col(ip_col).contains(":"), F.lit(".ip6.arpa")
    ).otherwise(F.lit(".in-addr.arpa"))
    q = ips.select(
        "entity",
        F.concat(reverse_ip(ip_col), suffix).alias("qname"),
    )
    return q.join(F.broadcast(first), "qname", "left").select(
        "entity",
        F.regexp_replace("rdata", r"\.$", "").alias("hostname"),
    )


def parse_caida_lines(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """CAIDA as2types list (reference: NERDd/modules/caida_as_class.py
    parse_list, :54-77) -> (asn, source, cls). Lines are
    ``asn|source|class``; ``#`` comments and non-numeric asn lines are
    dropped (the reference logs-and-skips them). Pure column ops —
    the list is a broadcast-sized dim (~70k rows at full CAIDA size).
    """
    parts = F.split(F.col(line_col), r"\|")
    return (
        lines.filter(~F.col(line_col).startswith("#"))
        .select(
            F.get(parts, 0).try_cast("long").alias("asn"),
            F.get(parts, 1).alias("source"),
            F.get(parts, 2).alias("cls"),
        )
        .filter(F.col("asn").isNotNull())
    )


def as_class_stage(
    asns: DataFrame,
    caida: DataFrame,
    class_values: dict[str, str] | None = None,
    source_confidence: dict[str, float] | None = None,
    asn_col: str = "asn",
) -> DataFrame:
    """CAIDA AS-class enrichment as a derivation stage (reference:
    NERDd/modules/caida_as_class.py determine_type/search_in_dict,
    :80-127).

    asns: (entity, asn); caida: (asn, source, cls) from
    :func:`parse_caida_lines`. Config knobs mirror the reference's
    ``caida.classes`` (class name -> stored value remap, :60-63) and
    ``caida.sources`` (source -> confidence, :91-97). Output:
    (entity, as_class_v, as_class_c) with the reference's exact write
    semantics — unknown ASN stores the literal ``'unknown'`` (:124),
    and confidence is stored ONLY when != 1 (:122-123; NULL otherwise).

    Plan: the dim is broadcast (70k rows), the class/confidence maps
    compile to literal CASE chains — one map-side join, no shuffle.
    """
    cls = F.col("cls")
    if class_values:
        remap = None
        for k, v in class_values.items():
            remap = (F.when(cls == k, v) if remap is None
                     else remap.when(cls == k, v))
        cls = remap.otherwise(cls)
    conf = F.lit(1.0)
    if source_confidence:
        c = None
        for k, v in source_confidence.items():
            cond = F.col("source") == k
            c = F.when(cond, float(v)) if c is None else c.when(cond, float(v))
        conf = c.otherwise(conf)
    dim = caida.select("asn", "source", cls.alias("_cls"), conf.alias("_conf"))
    out = asns.join(
        F.broadcast(dim), asns[asn_col] == dim["asn"], "left"
    )
    return out.select(
        "entity",
        F.coalesce("_cls", F.lit("unknown")).alias("as_class_v"),
        F.when(F.col("_conf") != 1.0, F.col("_conf")).alias("as_class_c"),
    )


def _ip4(s: str) -> int:
    a, b, c, d = (int(x) for x in s.split("."))
    return (a << 24) | (b << 16) | (c << 8) | d


# Reserved/bogon IPv4 ranges (reference: NERDd/modules/reserved_ip.py
# :14-31 — prefix strings + range regexes; here the same set expressed
# as the closed int ranges of en.wikipedia.org/wiki/Reserved_IP_addresses,
# the J4 broadcast-range-join shape instead of per-row string matching).
# Divergence, documented: the reference's 198.18.0.0/15 regex carries a
# stray ']' (reserved_ip.py:28) so it can never match; the range is
# intentionally reserved (RFC 2544), so it matches here.
RESERVED_RANGES: list[tuple[int, int]] = [
    (_ip4("0.0.0.0"), _ip4("0.255.255.255")),
    (_ip4("10.0.0.0"), _ip4("10.255.255.255")),
    (_ip4("100.64.0.0"), _ip4("100.127.255.255")),
    (_ip4("127.0.0.0"), _ip4("127.255.255.255")),
    (_ip4("169.254.0.0"), _ip4("169.254.255.255")),
    (_ip4("172.16.0.0"), _ip4("172.31.255.255")),
    (_ip4("192.0.0.0"), _ip4("192.0.0.255")),
    (_ip4("192.0.2.0"), _ip4("192.0.2.255")),
    (_ip4("192.168.0.0"), _ip4("192.168.255.255")),
    (_ip4("198.18.0.0"), _ip4("198.19.255.255")),
    (_ip4("198.51.100.0"), _ip4("198.51.100.255")),
    (_ip4("203.0.113.0"), _ip4("203.0.113.255")),
    (_ip4("224.0.0.0"), _ip4("255.255.255.255")),
]


def reserved_ip_stage(
    ips: DataFrame, ip_int_col: str = "ip_int"
) -> DataFrame:
    """Reserved-range tagging as a derivation stage (reference:
    NERDd/modules/reserved_ip.py is_reserved, :41-75 — sets
    ``reserved_range`` to 1/0 on every new IP).

    ips: (entity, ip_int). Output: (entity, reserved_range int).
    Plan: LEFT broadcast range join against the literal
    :data:`RESERVED_RANGES` table (disjoint, so at most one match) —
    map-side, no shuffle, no per-row regex.
    """
    spark = ips.sparkSession
    ranges = spark.createDataFrame(
        RESERVED_RANGES, "ip_from long, ip_to long"
    )
    ip = F.col(ip_int_col)
    return ips.join(
        F.broadcast(ranges), ip.between(F.col("ip_from"), F.col("ip_to")), "left"
    ).select(
        "entity",
        F.when(F.col("ip_from").isNotNull(), 1).otherwise(0)
        .alias("reserved_range"),
    )


def asn_rank_stage(
    asns: DataFrame, ranks: DataFrame, asn_col: str = "asn"
) -> DataFrame:
    """Per-ASN rank enrichment as a derivation stage (reference:
    NERDd/modules/eml_asn_rank.py get_rank, :38-68 — queries the EML
    API per new ASN and stores ``eml_rank`` as float; a failed/missing
    lookup stores nothing, :63-65).

    The API hop becomes a snapshotted rank dim (asn, rank) — the same
    feed-snapshot substrate the S2/S4 fetch seams produce (and the
    right shape for bgp_rank.py's CIRCL feed too). Output:
    (entity, eml_rank double, NULL when the ASN is absent from the
    snapshot). Plan: one broadcast dim join, map-side.
    """
    dim = ranks.select(
        F.col(asn_col).alias("_asn"), F.col("rank").cast("double").alias("eml_rank")
    )
    return asns.join(
        F.broadcast(dim), asns[asn_col] == dim["_asn"], "left"
    ).select("entity", "eml_rank")


def parse_geolite_blocks(blocks: DataFrame,
                         network_col: str = "network") -> DataFrame:
    """GeoLite2-CSV blocks (network 'a.b.c.d/p', geoname_id) ->
    (ip_from, ip_to, geoname_id) int ranges, pure column math:
    ip_to = ip_from + 2^(32-p) - 1."""
    net = F.split(F.col(network_col), "/")
    base = ipstr2int(F.get(net, 0))
    bits = F.lit(32) - F.get(net, 1).cast("int")
    # block size as pow (shiftleft needs a literal shift): 2^k is
    # exact in double through k=52, far past the 32 bits needed here
    size = F.pow(F.lit(2.0), bits.cast("double")).cast("long")
    return blocks.select(
        base.alias("ip_from"),
        (base + size - 1).alias("ip_to"),
        "geoname_id",
    )


def geo_stage(
    ips: DataFrame,
    blocks: DataFrame,
    locations: DataFrame,
    ip_int_col: str = "ip_int",
) -> DataFrame:
    """Per-entity geolocation from the GeoLite2 CSV layout.

    ips: (entity, ip_int); blocks: raw CSV shape (network CIDR,
    geoname_id); locations: (geoname_id, country_iso_code, city_name,
    time_zone). Output: (entity, geo_ctry, geo_city, geo_tz) — LEFT
    join semantics: an address outside every block keeps NULL geo
    fields (the reference sets nothing on AddressNotFoundError).

    Plan: broadcast range join on the parsed block ranges (GeoLite
    blocks are disjoint, so at most one match) + broadcast dim join
    on geoname_id. At beyond-broadcast scale swap in the bucketed
    range join (j4_range_join_bucketed) — same semantics.
    """
    ranges = parse_geolite_blocks(blocks)
    ip = F.col(ip_int_col)
    hit = ips.join(
        F.broadcast(ranges),
        ip.between(F.col("ip_from"), F.col("ip_to")),
        "left",
    ).join(F.broadcast(locations), "geoname_id", "left")
    return hit.select(
        "entity",
        F.col("country_iso_code").alias("geo_ctry"),
        F.col("city_name").alias("geo_city"),
        F.col("time_zone").alias("geo_tz"),
    )


def bgp_rank_stage(
    asns: DataFrame, ranks: DataFrame, asn_col: str = "asn"
) -> DataFrame:
    """CIRCL BGP-rank enrichment as a derivation stage (reference:
    NERDd/modules/bgp_rank.py set_bgprank, :35-83 — per-ASN API
    lookup storing ``circl_bgprank``).

    ranks is the snapshot dim sources/apienrich.py::snapshot_bgp_ranks
    builds from the triggered batch: an ASN the API knows is present
    with its rank; an ASN the API does NOT know is present with 0.0
    (the reference stores the 0.0 — :74-83); an ASN whose lookup
    errored is ABSENT and must stay untouched (the reference returns
    None, :80-82) -> NULL here, so the merge layer can skip it.

    Output: (entity, circl_bgprank double). Plan: one broadcast dim
    join, map-side — the dim is bounded by the triggered batch.
    """
    dim = ranks.select(
        F.col(asn_col).alias("_asn"),
        F.col("circl_bgprank").cast("double").alias("circl_bgprank"),
    )
    return asns.join(
        F.broadcast(dim), asns[asn_col] == dim["_asn"], "left"
    ).select("entity", "circl_bgprank")


def shodan_decisions(entities: DataFrame, snapshot: DataFrame) -> DataFrame:
    """Shodan/InternetDB update decisions (reference:
    NERDd/modules/shodan.py shodan(), :60-119).

    entities: (entity ip, had_shodan bool — record already carries a
    shodan attr, long_active bool — the _ttl.long_active tag, weekly
    bool — this trigger is the !every1w cron, not !NEW/!refresh).
    snapshot: sources/apienrich.py::snapshot_internetdb output.

    Decision column mirrors the reference branches:
    - 'skip'   weekly AND NOT long_active (DONT_UPDATE_SHORT_LIVED_IPS
               gate, :76-80) — the fetch never happens
    - 'set'    API has data (:108-119) -> the three arrays
    - 'remove' API 404 and the record had shodan data (:81-86)
    - 'none'   404 with nothing to remove (:87), or the entity is
               absent from the snapshot (fetch failed, :97-101)

    Plan: one equi join of the triggered batch against its own
    snapshot — both sides are batch-sized; AQE picks the strategy.
    """
    gated = entities.withColumn(
        "_skip", F.col("weekly") & ~F.col("long_active")
    )
    snap = snapshot.select(
        F.col("ip").alias("entity"), "found", "ports", "tags", "cpes"
    )
    j = gated.join(snap, "entity", "left")
    action = (
        F.when(F.col("_skip"), F.lit("skip"))
        .when(F.col("found"), F.lit("set"))
        .when(
            F.col("found").eqNullSafe(F.lit(False)) & F.col("had_shodan"),
            F.lit("remove"),
        )
        .otherwise(F.lit("none"))
    )
    keep = F.col("action") == "set"
    return j.select(
        "entity",
        action.alias("action"),
        "found",
        "ports", "tags", "cpes",
    ).select(
        "entity",
        "action",
        *[F.when(keep, F.col(c)).alias(c) for c in ("ports", "tags", "cpes")],
    )


def shodan_ops(decisions: DataFrame) -> DataFrame:
    """Decisions -> merge wire-format ops (operators/merge.py):
    'set' -> three ``set shodan.{ports,tags,cpes}`` ops (the reference
    emits exactly these three, :113-118); 'remove' -> one
    ``remove shodan`` (pops the subtree, :84-86); 'skip'/'none' emit
    nothing."""
    from nerd_spark.operators.merge import stable_seq

    sets = decisions.filter(F.col("action") == "set")
    set_rows = None
    for field in ("ports", "tags", "cpes"):
        r = sets.select(
            F.col("entity").alias("eid"),
            F.lit("set").alias("op"),
            F.lit(f"shodan.{field}").alias("key"),
            F.to_json(F.struct(F.col(field).alias("value"))).alias("params"),
        )
        set_rows = r if set_rows is None else set_rows.unionByName(r)
    removes = decisions.filter(F.col("action") == "remove").select(
        F.col("entity").alias("eid"),
        F.lit("remove").alias("op"),
        F.lit("shodan").alias("key"),
        F.lit("{}").alias("params"),
    )
    return stable_seq(set_rows.unionByName(removes))


def passive_dns_decisions(
    resolved: DataFrame, bl_meta: DataFrame, bl_member: DataFrame
) -> DataFrame:
    """Passive-DNS domain-blacklist decisions (reference:
    NERDd/modules/passive_dns.py passive_dns_query(), :92-144).

    resolved: (entity ip, domain) pairs from
    sources/apienrich.py::snapshot_passive_dns (already negative-
    filtered, de-duplicated, dot-stripped). bl_meta: (blname,
    t string) — one row per configured domain blacklist with its
    last-update time (the Redis ``dbl:<id>:time`` key, :36-44).
    bl_member: (blname, domain) membership pairs (``dbl:<id>:list``).

    The reference checks EVERY domain against EVERY blacklist and
    emits v=1 (on-list) or v=0 (off-list) with the list's update time
    (:131-143) -> cross the pairs with the blacklist catalogue
    (broadcast — a config handful), LEFT join membership, derive v.

    Output: (entity, blname, domain, v int, t). Plan: one broadcast
    nested-loop against bl_meta (a config handful by construction —
    one row per CONFIGURED blacklist, so the hint is size-safe) + one
    equi join on (blname, domain); the membership table is NOT hinted
    — a real-world domain blacklist can hold millions of entries, so
    Catalyst/AQE picks broadcast vs shuffle from measured size (the
    same discipline as bigram_logprob's corpus-growing table; a
    forced hint here was the r8-advice forced-broadcast defect class).
    """
    crossed = resolved.crossJoin(F.broadcast(bl_meta))
    hit = bl_member.select("blname", "domain", F.lit(1).alias("v"))
    return (
        crossed.join(hit, ["blname", "domain"], "left")
        .select(
            "entity",
            "blname",
            "domain",
            F.coalesce("v", F.lit(0)).alias("v"),
            "t",
        )
    )


def passive_dns_ops(decisions: DataFrame) -> DataFrame:
    """Decisions -> merge wire-format ops on the ``dbl`` array
    (reference :137-143): on-list -> ``array_upsert dbl {n,d}``
    [set v 1, set t time, append h time] (inserts the entry and grows
    the hit history); off-list -> ``array_update dbl {n,d}``
    [set v 0, set t time] (updates an EXISTING entry only — a domain
    never seen on the list gets no entry, matching array_update's
    no-op-when-absent semantics in operators/merge.py)."""
    from nerd_spark.operators.merge import stable_seq

    query = F.struct(F.col("blname").alias("n"), F.col("domain").alias("d"))
    t_params = F.to_json(F.struct(F.col("t").alias("value")))
    on_ops = F.array(
        F.array(F.lit("set"), F.lit("v"), F.lit('{"value": 1}')),
        F.array(F.lit("set"), F.lit("t"), t_params),
        F.array(F.lit("append"), F.lit("h"), t_params),
    )
    off_ops = F.array(
        F.array(F.lit("set"), F.lit("v"), F.lit('{"value": 0}')),
        F.array(F.lit("set"), F.lit("t"), t_params),
    )
    rows = decisions.select(
        F.col("entity").alias("eid"),
        F.when(F.col("v") == 1, F.lit("array_upsert"))
        .otherwise(F.lit("array_update"))
        .alias("op"),
        F.lit("dbl").alias("key"),
        F.to_json(
            F.struct(
                query.alias("query"),
                F.when(F.col("v") == 1, on_ops).otherwise(off_ops).alias("ops"),
            )
        ).alias("params"),
    )
    return stable_seq(rows)
