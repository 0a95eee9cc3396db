"""Feed parsers: blacklist files and DShield daily reports (SURVEY
§2.1 S2/S3).

The reference downloads feeds over HTTP then regex-parses IPs
(reference: NERDd/blacklists.py:44-189 — line-per-IP or regex modes,
cron scheduled :283-303) and parses the DShield TSV with
leading-zero octet stripping + a minimum-reports threshold
(NERDd/dshield.py:64-112). Fetching is an external concern (cron +
wget equivalent); parsing is declarative here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nerd_spark.functions.ip import ipstr2int

_IP_RE = r"((?:\d{1,3}\.){3}\d{1,3})"


def parse_blacklist(
    lines: DataFrame, bl_id: str, regex: str | None = None, col: str = "value"
) -> DataFrame:
    """Feed lines -> (bl_id, ip, ip_int) rows.

    regex=None: line-per-IP mode (strip comments/blank lines);
    otherwise extract every regex match per line (the '\\A' shorthand
    family of the reference collapses to a plain IP regex here).
    Octet-validity is enforced by range-checking the parsed int.
    """
    c = F.col(col)
    if regex is None:
        ips = lines.filter(~c.startswith("#") & (F.trim(c) != "")).select(
            F.regexp_extract(F.trim(c), _IP_RE, 1).alias("ip")
        )
    else:
        ips = lines.select(
            F.explode(F.regexp_extract_all(c, F.lit(regex), F.lit(1))).alias("ip")
        )
    valid = (
        ips.filter(F.col("ip") != "")
        .withColumn("ip_int", ipstr2int("ip"))
        .filter(F.col("ip_int").between(0, 2**32 - 1))
        # reject octets > 255 (ipstr2int would carry over)
        .filter(
            ~F.exists(
                F.split("ip", r"\."),
                lambda o: F.coalesce(o.try_cast("int") > 255, F.lit(True)),
            )
        )
        .distinct()
    )
    return valid.select(F.lit(bl_id).alias("bl_id"), "ip", "ip_int")


def normalize_dshield_ip(col) -> F.Column:
    """Strip leading zeros per octet (dshield.py:75-80: '010.001.2.3'
    -> '10.1.2.3') by round-tripping through int casts."""
    return F.concat_ws(
        ".", F.transform(F.split(col, r"\."), lambda o: o.cast("int").cast("string"))
    )


def parse_dshield(feed: DataFrame, min_reports: int = 5) -> DataFrame:
    """DShield TSV rows (ip, reports, targets) -> per-IP rollup with
    threshold (dshield.py:70-89: sum per IP, keep reports >= min)."""
    norm = feed.select(
        normalize_dshield_ip(F.col("ip")).alias("ip"),
        F.col("reports").cast("long").alias("reports"),
        F.col("targets").cast("long").alias("targets"),
    )
    return (
        norm.groupBy("ip")
        .agg(F.sum("reports").alias("reports"), F.sum("targets").alias("targets"))
        .filter(F.col("reports") >= min_reports)
        .withColumn("ip_int", ipstr2int("ip"))
    )
