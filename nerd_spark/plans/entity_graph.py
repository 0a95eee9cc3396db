"""The 5-type entity graph: ip — bgppref — asn — org, ip — ipblock — org
(SURVEY §1.1; reference diagram NERDd/modules/whois.py:66-69).

Reference behavior rebuilt Spark-first:
- enrichment: per-result-row find_one loops (reference:
  NERDweb/nerd_main.py:1100-1118, attach_whois_data :1901-1971)
  become broadcast hash joins, including the M:N asn<->bgppref hop
  (array-membership join).
- ref-counting: the reference ticks _ref_cnt incrementally with
  cascades (whois.py:239-296) and ships a repair script
  (scripts/fix_ref_cnt.js:13-109) because ticking drifts; here counts
  and pointer arrays are always *recomputed* aggregates — the repair
  script IS the implementation.
- IANA allocation lookup: bisect into sorted (first, last, rir)
  arrays (whois.py:194-238) becomes the J4 range join
  (operators/rangejoin.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_ips(
    ip: DataFrame, bgppref: DataFrame, asn: DataFrame, ipblock: DataFrame, org: DataFrame
) -> DataFrame:
    """J2/J3: attach prefix, origin ASNs (M:N), block and org data to
    each IP row. All dims broadcast (10^2-10^5 rows in practice)."""
    bp = F.broadcast(
        bgppref.select(
            F.col("_id").alias("bgppref"), F.col("rep").alias("bgppref_rep"),
            F.col("asn").alias("_asns"),
        )
    )
    out = ip.join(bp, "bgppref", "left")
    a = F.broadcast(
        asn.select(
            F.col("_id").alias("asn_id"), F.col("name").alias("asn_name"),
            F.col("org").alias("asn_org"),
        )
    )
    # M:N hop: one output row per origin ASN of the IP's prefix
    out = out.withColumn("asn_id", F.explode_outer("_asns")).drop("_asns").join(
        a, "asn_id", "left"
    )
    blk = F.broadcast(
        ipblock.select(
            F.col("_id").alias("ipblock"), F.col("org").alias("block_org"),
            F.col("rir").alias("block_rir"),
        )
    )
    out = out.join(blk, "ipblock", "left")
    o = F.broadcast(
        org.select(F.col("_id").alias("org_id"), F.col("name").alias("org_name"))
    )
    return out.join(o, out.asn_org == o.org_id, "left").drop("org_id")


def rebuild_ref_counts(
    ip: DataFrame, bgppref: DataFrame, ipblock: DataFrame, org: DataFrame, asn: DataFrame
) -> dict[str, DataFrame]:
    """A12: recompute every _ref_cnt and the asn<->bgppref pointer
    arrays from the ground truth (scripts/fix_ref_cnt.js semantics):
    - bgppref._ref_cnt / ipblock._ref_cnt = referencing IPs
    - asn.bgppref[] rebuilt from bgppref.asn[] ($unwind+$group+$push)
    - org._ref_cnt = referencing ASNs + referencing ipblocks ($inc x2)
    """
    bp_cnt = ip.groupBy("bgppref").agg(F.count("*").alias("_ref_cnt"))
    bgppref_out = (
        bgppref.drop("_ref_cnt")
        .join(bp_cnt.withColumnRenamed("bgppref", "_id"), "_id", "left")
        .na.fill({"_ref_cnt": 0})
    )

    blk_cnt = ip.groupBy("ipblock").agg(F.count("*").alias("_ref_cnt"))
    ipblock_out = (
        ipblock.drop("_ref_cnt")
        .join(blk_cnt.withColumnRenamed("ipblock", "_id"), "_id", "left")
        .na.fill({"_ref_cnt": 0})
    )

    # asn.bgppref[] pointer arrays from the M:N ground truth
    asn_ptrs = (
        bgppref.select(F.col("_id").alias("pref"), F.explode("asn").alias("asn_id"))
        .groupBy("asn_id")
        .agg(F.sort_array(F.collect_list("pref")).alias("bgppref"))
    )
    asn_out = (
        asn.drop("bgppref")
        .join(asn_ptrs.withColumnRenamed("asn_id", "_id"), "_id", "left")
    )

    org_from_asn = asn.filter(F.col("org").isNotNull()).groupBy("org").agg(
        F.count("*").alias("n1")
    )
    org_from_blk = ipblock.filter(F.col("org").isNotNull()).groupBy("org").agg(
        F.count("*").alias("n2")
    )
    org_out = (
        org.drop("_ref_cnt")
        .join(org_from_asn.withColumnRenamed("org", "_id"), "_id", "left")
        .join(org_from_blk.withColumnRenamed("org", "_id"), "_id", "left")
        .withColumn(
            "_ref_cnt", F.coalesce("n1", F.lit(0)) + F.coalesce("n2", F.lit(0))
        )
        .drop("n1", "n2")
    )
    return {
        "bgppref": bgppref_out,
        "ipblock": ipblock_out,
        "asn": asn_out,
        "org": org_out,
    }


def ips_in_asn(ip: DataFrame, asn: DataFrame, asn_id: int) -> DataFrame:
    """P8: the ASN semijoin — IPs whose bgppref belongs to the ASN
    (reference: nerd_main.py:996-1003 — lookup the ASN record, then
    filter on prefix membership)."""
    prefs = asn.filter(F.col("_id") == asn_id).select(
        F.explode("bgppref").alias("bgppref")
    )
    return ip.join(F.broadcast(prefs), "bgppref", "left_semi")


def cascade_deletes(
    deleted_ips: DataFrame,
    bgppref: DataFrame,
    ipblock: DataFrame,
    org: DataFrame,
    asn: DataFrame,
) -> dict[str, DataFrame]:
    """Incremental `!DELETE` cascade over the entity graph (reference:
    NERDd/modules/whois.py:239-296 — record deletion decrements its
    bgppref/ipblock `_ref_cnt`; a count dropping to zero deletes that
    whois record, unlinks it from asn pointer arrays, and decrements
    org, which is itself garbage-collected at zero).

    Inputs: ``deleted_ips`` = the deleted IP records (``bgppref`` /
    ``ipblock`` fk columns); dim tables with CURRENT counts (e.g. from
    :func:`rebuild_ref_counts` — equivalence with the rebuild under a
    random delete sequence is property-tested). Rows whose count was
    already zero before the cascade are left in place (expiring those
    is the cleaner's TTL job, not the cascade's).

    Scale: cost is O(|deleted| + |dims|) — the decrement frames group
    the (small) delete batch and broadcast into the dim joins; the ip
    table itself is never rescanned. Pointer arrays come back sorted,
    matching the rebuild's normal form.
    """

    def dec(table: DataFrame, counts: DataFrame):
        tx = table.join(
            F.broadcast(counts.withColumnRenamed("fk", "_id")), "_id", "left"
        ).withColumn("_new", F.col("_ref_cnt") - F.coalesce("n", F.lit(0)))
        dead = tx.filter(F.col("n").isNotNull() & (F.col("_new") <= 0))
        alive = (
            tx.filter(F.col("n").isNull() | (F.col("_new") > 0))
            .withColumn("_ref_cnt", F.col("_new"))
            .drop("n", "_new")
        )
        return alive, dead

    def fk_counts(df: DataFrame, col: str) -> DataFrame:
        return (
            df.filter(F.col(col).isNotNull())
            .groupBy(F.col(col).alias("fk"))
            .agg(F.count("*").alias("n"))
        )

    bgppref_out, dead_bp = dec(bgppref, fk_counts(deleted_ips, "bgppref"))
    ipblock_out, dead_blk = dec(ipblock, fk_counts(deleted_ips, "ipblock"))

    # unlink dead prefixes from asn pointer arrays: explode ->
    # anti-join the dead set -> regroup (distributed; no driver list)
    ptrs = asn.select("_id", F.explode_outer("bgppref").alias("p"))
    kept = ptrs.join(
        F.broadcast(dead_bp.select(F.col("_id").alias("p"))), "p", "left_anti"
    )
    regrouped = kept.groupBy("_id").agg(
        F.sort_array(F.collect_list("p")).alias("bgppref"),
        F.count("p").alias("_n_left"),
    )
    lost = (
        ptrs.join(
            F.broadcast(dead_bp.select(F.col("_id").alias("p"))), "p", "left_semi"
        )
        .groupBy("_id")
        .agg(F.count("*").alias("_n_lost"))
    )
    asn_x = (
        asn.drop("bgppref")
        .join(regrouped, "_id", "left")
        .join(lost, "_id", "left")
        .na.fill({"_n_left": 0, "_n_lost": 0})
    )
    dead_asn = asn_x.filter((F.col("_n_lost") > 0) & (F.col("_n_left") == 0))
    asn_out = asn_x.filter(
        (F.col("_n_lost") == 0) | (F.col("_n_left") > 0)
    ).drop("_n_left", "_n_lost")

    org_dec = (
        fk_counts(dead_asn, "org")
        .unionByName(fk_counts(dead_blk, "org"))
        .groupBy("fk")
        .agg(F.sum("n").alias("n"))
    )
    org_out, _dead_org = dec(org, org_dec)
    return {
        "bgppref": bgppref_out,
        "ipblock": ipblock_out,
        "asn": asn_out,
        "org": org_out,
    }
