"""Distribution drift between two corpus snapshots.

The monitoring primitive a continuously-ingesting training-data
pipeline runs next to its dedup/quality gates: has the distribution
of a feature (token counts, quality scores, document lengths, event
values) moved between a reference snapshot and a new one? The IVF-PQ
drift audit (audits/drift_ivfpq.py) showed why this matters — frozen
models degrade under DISTRIBUTION SHIFT, not under volume — and this
operator is the cheap detector for that shift on any numeric column.

Measures (both standard):

- PSI (population stability index): sum_i (p_i - q_i) * ln(p_i/q_i)
  over buckets — the industry drift score (rule of thumb: < 0.1
  stable, 0.1-0.25 moderate, > 0.25 shifted).
- Jensen-Shannon divergence (natural log): symmetric, bounded by
  ln 2, robust to empty buckets.

Bucketing is FIXED-WIDTH over the REFERENCE snapshot's [min, max]
(underflow/overflow clamp to the edge buckets), so the bucket
function depends only on reference scalars and the whole computation
is two column-pruned scans + two bucket-sized aggregations — no
shuffle ever carries more than n_buckets rows per side. Empty-bucket
mass is floored at EPS = 1e-6 before the logs (the standard PSI
smoothing), which also makes the result a total function of the two
histograms. Exactly reproducible in plain SQL, so the operator is
DuckDB-oracle-checkable like the rest of the sketch family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EPS = 1e-6


def _bucket_hist(df: DataFrame, col: str, lo, width, n_buckets: int):
    """(bucket, cnt) histogram with reference-anchored fixed-width
    buckets; out-of-range values clamp to the edge buckets."""
    b = F.floor((F.col(col) - F.lit(lo)) / F.lit(width)).cast("long")
    b = F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), b))
    return (
        df.filter(F.col(col).isNotNull())
        .select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def distribution_drift(
    ref: DataFrame,
    new: DataFrame,
    col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """PSI and JS divergence of `new` against `ref` on a numeric
    column. Returns ONE row: (n_ref, n_new, psi, js_div), both scores
    rounded to 6 dp. Raises on an empty/all-null reference (no scale
    to anchor buckets to); an empty `new` yields the maximal-drift
    score of an all-in-EPS histogram rather than an error, so a
    monitoring job sees a loud number, not a crash.

    Plan shape: one reference scan for (min, max, n) — two scalars
    anchor the bucket function — then one bucket histogram per side
    (map-side combined; at most n_buckets rows reach the final agg),
    and the divergence arithmetic runs over a joined n_buckets-row
    frame. 100 TB cost = two column-pruned scans.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    stats = ref.agg(
        F.min(col).alias("lo"),
        F.max(col).alias("hi"),
        F.count(col).alias("n"),
    ).first()
    if not stats["n"]:
        raise ValueError("reference snapshot has no non-null values")
    lo, hi = stats["lo"], stats["hi"]
    width = (hi - lo) / n_buckets
    if width <= 0:  # constant reference column: one real bucket
        width = 1.0
    spark = ref.sparkSession
    buckets = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    ha = _bucket_hist(ref, col, lo, width, n_buckets)
    hb = _bucket_hist(new, col, lo, width, n_buckets)
    n_new = new.filter(F.col(col).isNotNull()).count()
    j = (
        buckets.join(F.broadcast(ha), "bucket", "left")
        .join(F.broadcast(hb.withColumnRenamed("cnt", "cnt_b")), "bucket", "left")
        .select(
            "bucket",
            F.greatest(
                F.lit(EPS),
                F.coalesce("cnt", F.lit(0)) / F.lit(float(stats["n"])),
            ).alias("p"),
            F.greatest(
                F.lit(EPS),
                F.coalesce("cnt_b", F.lit(0)) / F.lit(float(max(n_new, 1))),
            ).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    return j.agg(
        F.lit(int(stats["n"])).cast("long").alias("n_ref"),
        F.lit(int(n_new)).cast("long").alias("n_new"),
        F.round(
            F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))),
            6,
        ).alias("psi"),
        F.round(
            F.sum(
                (F.col("p") * F.log(F.col("p") / m)
                 + F.col("q") * F.log(F.col("q") / m)) / 2
            ),
            6,
        ).alias("js_div"),
    )


def shingle_novelty(
    ref: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Corpus freshness: the fraction of the new snapshot's distinct
    k-word shingles unseen in the reference — the text companion to
    :func:`distribution_drift` (numeric drift says a FEATURE moved;
    novelty says the CONTENT did). Near 0 = the crawl is re-fetching
    what it already has; near 1 = genuinely new material (or a domain
    shift worth a look at the dedup/quality gates downstream).

    Returns ONE row: (n_ref_shingles, n_new_shingles, novel_shingles,
    novelty_rate). Shingling is the dedup family's map-only
    shingle_arrays (identical '' -token edge semantics, so the SQL
    oracle parity is inherited from the minhash oracles); both sides
    reduce to DISTINCT shingles before anything shuffles, and the
    novel count is one anti-join of the two distinct sets — the same
    distinct-shingle-bounded cost class as the dedup DF counting, and
    the exact-answer counterpart of a minhash containment estimate.
    """
    from nerd_spark.operators.dedup import shingle_arrays

    def _distinct(df: DataFrame) -> DataFrame:
        return (
            shingle_arrays(df, id_col, text_col, k)
            .select(F.explode(F.array_distinct("sarr")).alias("s"))
            .distinct()
        )

    rs = _distinct(ref).persist()  # two consumers: count + anti join
    ns = _distinct(new).persist()
    n_ref = rs.count()
    n_new = ns.count()
    novel = ns.join(rs, "s", "anti").count()
    rs.unpersist()
    ns.unpersist()
    spark = ref.sparkSession
    # rate rounded IN-PLAN: Spark round is HALF_UP like the SQL
    # oracle's; Python's built-in round is banker's (a pinned trap)
    return spark.createDataFrame(
        [(n_ref, n_new, novel)],
        "n_ref_shingles long, n_new_shingles long, novel_shingles long",
    ).select(
        "*",
        F.round(
            F.col("novel_shingles") / F.greatest(F.col("n_new_shingles"), F.lit(1)),
            6,
        ).alias("novelty_rate"),
    )
