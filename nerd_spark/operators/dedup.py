"""Deduplication operators for large-scale training-data pipelines.

Four strategies, all pure DataFrame compositions (no UDFs):

- exact:     md5 fingerprint of normalized text -> hash groupBy.
- jaccard:   n-gram shingle sets; candidate pairs via a shingle
             equi-join (document-frequency-capped to kill the
             hot-shingle blowup), verified by exact Jaccard.
- minhash:   banded MinHash LSH — per (doc, band) signature
             min(md5(band || shingle)); candidates share a band
             signature; verify with exact Jaccard on candidates only.
             This is the 100 TB path: cost is O(docs x bands) +
             near-dup-bucket joins, never all-pairs.
- simhash:   per-doc bitwise-majority hash over token hashes; equal
             or near hashes -> near-dups.

Everything uses md5 (hex string) as the hash so an ANSI-SQL oracle
computes identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nerd_spark.functions.text import fingerprint, tokens, word_shingles


def exact_dedup(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Group identical (normalized) texts: fingerprint, member count,
    canonical id (min). One shuffle on the 32-char hash."""
    return (
        docs.select(F.col(id_col).alias("id"), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("id").alias("canonical_id"))
    )


def shingle_rows(docs: DataFrame, id_col="doc_id", text_col="text", k=3) -> DataFrame:
    """Distinct k-word shingles per doc, exploded to rows."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_shingles(text_col, k))).alias("s"),
    )


def _pair_jaccard(cand: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate (a_id, b_id) pairs from shingle rows."""
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("id").alias("a_id"), "s")
    b = sh.select(F.col("id").alias("b_id"), "s")
    inter = (
        cand.join(a, "a_id")
        .join(b, ["b_id", "s"])
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("c"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "a_id", "n": "na"}), "a_id")
        .join(sizes.withColumnsRenamed({"id": "b_id", "n": "nb"}), "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(
                F.col("c") / (F.col("na") + F.col("nb") - F.col("c")), 6
            ).alias("jaccard"),
        )
    )


def jaccard_dedup(
    docs: DataFrame,
    id_col="doc_id",
    text_col="text",
    k=3,
    threshold=0.8,
    max_df=20,
) -> DataFrame:
    """Near-dup pairs by exact shingle Jaccard >= threshold.

    Candidate generation joins docs on shared shingles, keeping only
    shingles appearing in <= max_df docs (stop-shingle removal): a
    pair sharing only ultra-common shingles is never considered —
    acceptable for near-dup detection and essential at scale (the
    hot-shingle join otherwise degenerates to all-pairs).
    """
    sh = shingle_rows(docs, id_col, text_col, k).cache()
    df_ok = (
        sh.groupBy("s").agg(F.count("*").alias("df")).filter(F.col("df") <= max_df)
    )
    rare = sh.join(df_ok.select("s"), "s")
    cand = (
        rare.alias("x")
        .join(rare.alias("y"), "s")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a_id"), F.col("y.id").alias("b_id"))
        .distinct()
    )
    return _pair_jaccard(cand, sh).filter(F.col("jaccard") >= threshold)


def minhash_lsh_dedup(
    spark: SparkSession,
    docs: DataFrame,
    id_col="doc_id",
    text_col="text",
    k=3,
    n_bands=8,
    threshold=0.5,
) -> DataFrame:
    """Banded MinHash LSH near-dup pairs, verified by exact Jaccard.

    Signature per (doc, band) = min(md5(band || '|' || shingle)) —
    a valid min-hash family since md5 orders shingles pseudo-randomly
    per band. Two docs collide in a band with probability equal to
    their Jaccard similarity; n_bands=8 catches j>=0.5 pairs w.h.p.
    """
    sh = shingle_rows(docs, id_col, text_col, k).cache()
    bands = spark.range(n_bands).select(F.col("id").cast("int").alias("b"))
    mh = (
        sh.crossJoin(F.broadcast(bands))
        .groupBy("id", "b")
        .agg(
            F.min(
                F.md5(F.concat(F.col("b").cast("string"), F.lit("|"), F.col("s")))
            ).alias("h")
        )
    )
    cand = (
        mh.alias("x")
        .join(mh.alias("y"), ["b", "h"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a_id"), F.col("y.id").alias("b_id"))
        .distinct()
    )
    return _pair_jaccard(cand, sh).filter(F.col("jaccard") >= threshold)


def simhash(docs: DataFrame, id_col="doc_id", text_col="text", bits=16) -> DataFrame:
    """Per-doc SimHash over distinct whitespace tokens.

    Token hash = first 4 hex chars of md5 -> 16-bit int; hash bit j is
    1 when the majority (strict) of token hashes set bit j. Pure
    column math (conv + bit ops) so the oracle can reproduce it.
    """
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    )
    h = F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long")
    per_tok = toks.select("id", h.alias("h"))
    bit_sums = per_tok.groupBy("id").agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))).alias(f"b{j}")
            for j in range(bits)
        ],
    )
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") * 2 > F.col("n"), F.lit(2**j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return bit_sums.select("id", sim.cast("long").alias("simhash"))
