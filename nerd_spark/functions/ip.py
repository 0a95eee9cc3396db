"""IPv4 integer codec + subnet math as Column expressions.

The reference stores IPv4 as uint32 so subnet queries become range
scans (reference: common/utils.py:9-18 ipstr2int/int2ipstr;
NERDweb/nerd_main.py:968-973 cidr→[net, broadcast] range). We keep
the same encoding in a LongType column; everything below is pure
column math (whole-stage-codegen, no UDFs) so predicates stay
pushdown-eligible.
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import Column
from pyspark.sql import functions as F


def ipstr2int(col: Column | str) -> Column:
    """Dotted-quad string -> uint32 (as long); NULL when malformed.

    aggregate(octets, acc -> acc*256 + octet) over split('.'). The
    reference's ipstr2int raises on malformed input
    (common/utils.py:9-13 via inet_aton); in a column expression the
    equivalent is NULL-out — '1.2.3', '1.2.3.4.5', octets > 255 or
    non-numeric all yield NULL so bad IPs are droppable upstream
    instead of silently mis-bucketing.
    """
    c = F.col(col) if isinstance(col, str) else col
    octets = F.split(c, r"\.")
    valid = (F.size(octets) == 4) & F.forall(
        octets,
        lambda x: x.rlike(r"^\d{1,3}$") & x.try_cast("long").between(0, 255),
    )
    raw = F.aggregate(
        octets,
        F.lit(0).cast("long"),
        lambda acc, x: acc * 256 + x.try_cast("long"),
    )
    return F.when(valid, raw)


def int2ipstr(col: Column | str) -> Column:
    """uint32 (long) -> dotted-quad string via shifts and masks."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat_ws(
        ".",
        (F.shiftright(c, 24).bitwiseAND(F.lit(255))).cast("string"),
        (F.shiftright(c, 16).bitwiseAND(F.lit(255))).cast("string"),
        (F.shiftright(c, 8).bitwiseAND(F.lit(255))).cast("string"),
        (c.bitwiseAND(F.lit(255))).cast("string"),
    )


def prefix24(col: Column | str) -> Column:
    """/24 prefix id of an int IP (reference: NERDd/fmp_updater.py:224-226)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.shiftright(c, 8)


def subnet_range(cidr: str) -> tuple[int, int]:
    """CIDR -> inclusive [network, broadcast] int range (driver-side).

    Mirrors the query builder's subnet predicate
    (reference: NERDweb/nerd_main.py:968-973).
    """
    net = ipaddress.ip_network(cidr, strict=False)
    return int(net.network_address), int(net.broadcast_address)


def subnet_predicate(ip_int_col: Column | str, cidr: str) -> Column:
    """Membership of int-IP column in a CIDR block as a range predicate."""
    lo, hi = subnet_range(cidr)
    c = F.col(ip_int_col) if isinstance(ip_int_col, str) else ip_int_col
    return c.between(lo, hi)


def reverse_ip(col: Column | str) -> Column:
    """Reversed IP string for DNSBL query names, as a pure column
    expression (reference: NERDd/modules/dnsbl.py:74-88 reverse_ip):

    - IPv4: octets reversed — ``100.20.3.4 -> 4.3.20.100``
    - IPv6: the EXPLODED address's 32 hex nibbles reversed and
      dot-separated — ``2001:db8::1000 ->
      0.0.0.1.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.8.b.d.0.1.0.0.2``

    The '::' gap expands via group arithmetic (8 minus present
    groups); F.get (null-safe) instead of element_at, which throws on
    out-of-bounds under ANSI mode.
    """
    c = F.col(col) if isinstance(col, str) else col
    v4 = F.concat_ws(".", F.reverse(F.split(c, r"\.")))
    halves = F.split(c, "::")
    left = F.filter(F.split(F.get(halves, 0), ":"), lambda x: x != "")
    right_raw = F.get(halves, 1)
    right = F.when(
        right_raw.isNull(), F.array().cast("array<string>")
    ).otherwise(F.filter(F.split(right_raw, ":"), lambda x: x != ""))
    groups = F.concat(
        left,
        F.array_repeat(F.lit("0"), (F.lit(8) - F.size(left) - F.size(right)).cast("int")),
        right,
    )
    nibbles = F.concat_ws(
        "", F.transform(groups, lambda g: F.lpad(F.lower(g), 4, "0"))
    )
    v6 = F.concat_ws(".", F.split(F.reverse(nibbles), ""))
    return F.when(c.contains(":"), v6).otherwise(v4)
