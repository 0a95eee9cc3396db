"""Query-surface filter builder: the `create_query` equivalent
(SURVEY §3.2; reference: NERDweb/nerd_main.py:965-1045 builds a Mongo
filter tree from the /ips search form). Here a declarative spec
compiles to one conjunction Column over the entity table — predicate
families P2-P8.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nerd_spark.functions.ip import subnet_range


@dataclass
class EntityQuery:
    """Filter spec mirroring the reference's IPFilterForm fields
    (reference: nerd_main.py:868-962)."""

    subnet: str | None = None  # P2: CIDR -> int range
    ip_list: list[str] | None = None  # P3: OR of points/CIDRs
    hostname_suffix: str | None = None  # P4
    ctry_in: list[str] = field(default_factory=list)  # P5 (OR)
    cats_any: list[str] = field(default_factory=list)  # P5 OR combinator
    cats_all: list[str] = field(default_factory=list)  # P5 AND combinator
    tag_exists: list[str] = field(default_factory=list)  # P7
    rep_min: float | None = None
    asn_prefixes: list[str] | None = None  # P8 semijoin values

    def compile(self, df: DataFrame) -> Column:
        preds: list[Column] = []
        if self.subnet:
            lo, hi = subnet_range(self.subnet)
            preds.append(F.col("ip_int").between(lo, hi))
        if self.ip_list:
            ors = []
            for item in self.ip_list:
                lo, hi = subnet_range(item if "/" in item else item + "/32")
                ors.append(F.col("ip_int").between(lo, hi))
            p = ors[0]
            for o in ors[1:]:
                p = p | o
            preds.append(p)
        if self.hostname_suffix:
            # reversed-hostname range trick == endswith (mongodb.py:91-93)
            preds.append(F.reverse(F.col("hostname")).startswith(self.hostname_suffix[::-1]))
        if self.ctry_in:
            preds.append(F.col("ctry").isin(self.ctry_in))
        if self.cats_any:
            ors = [F.array_contains("cats", c) for c in self.cats_any]
            p = ors[0]
            for o in ors[1:]:
                p = p | o
            preds.append(p)
        for c in self.cats_all:
            preds.append(F.array_contains("cats", c))
        for tag in self.tag_exists:
            preds.append(F.map_contains_key("tags", F.lit(tag)))
        if self.rep_min is not None:
            preds.append(F.col("rep") >= self.rep_min)
        if self.asn_prefixes is not None:
            preds.append(F.col("bgppref").isin(self.asn_prefixes))
        out = F.lit(True)
        for p in preds:
            out = out & p
        return out


def search(
    df: DataFrame,
    spec: EntityQuery,
    sort_by: str = "rep",
    ascending: bool = False,
    limit: int = 20,
) -> DataFrame:
    """filter -> sort -> limit (W1: Catalyst rewrites to top-k); id
    tie-break for determinism."""
    key = F.col(sort_by).asc() if ascending else F.col(sort_by).desc()
    return df.filter(spec.compile(df)).orderBy(key, F.col("entity")).limit(limit)
