"""Train/val splitting and sequence packing — the sampling half of a
training-data pipeline.

Splitting comes in two shapes:
- `hash_split`: deterministic md5-threshold assignment, MAP-ONLY.
  The 100 TB path — no shuffle, no state; quotas hold in expectation.
- `stratified_split`: exact per-stratum quotas via ranking — one
  shuffle per stratum column. For when "10% of each language" must
  be exact, not expected; at scale you run it on the (much smaller)
  doc-metadata projection, never the text.

Packing (`pack_sequences`) fills fixed token budgets greedily in doc
order within each group. Greedy fill carries running state that no
window function expresses (leftover space is discarded at bin
boundaries), so it is the textbook applyInPandas case: groups pack
independently, and the Arrow exchange carries ONLY (id, n_tokens) —
token counting runs JVM-side first and the text never crosses into
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from nerd_spark.functions.text import token_count

# 32-bit value of the first 8 md5 hex chars of the stringified id,
# uniform on [0, 2^32). Same expression exists in DuckDB (see the
# train_val_split oracle), so split assignment is oracle-checkable.
_HASH_SPAN = float(1 << 32)


def _id_hash(id_col: str, salt: str) -> F.Column:
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def hash_split(
    docs: DataFrame,
    val_frac: float = 0.1,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Append a map-only deterministic `split` column ('val' if the
    id's hash falls under val_frac, else 'train'). Changing `salt`
    re-rolls the assignment without touching the data."""
    v = _id_hash(id_col, salt)
    return docs.withColumn(
        "split", F.when(v < int(val_frac * _HASH_SPAN), F.lit("val")).otherwise("train")
    )


def stratified_split(
    docs: DataFrame,
    strata_col: str,
    val_frac: float = 0.1,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Append `split` with EXACT floor(val_frac * n) val rows per
    stratum: rank each stratum by id-hash (hash order = unbiased,
    deterministic) and cut at the quota."""
    v = _id_hash(id_col, salt)
    w = Window.partitionBy(strata_col).orderBy(v, F.col(id_col))
    wall = Window.partitionBy(strata_col)
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wall))
        .withColumn(
            "split",
            F.when(
                F.col("_rk") <= F.floor(F.lit(val_frac) * F.col("_n")), F.lit("val")
            ).otherwise("train"),
        )
        .drop("_rk", "_n")
    )


def mixture_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-source mixture resampling, MAP-ONLY — the
    domain-weighting step of a training-data pipeline (rate 0.25 on a
    noisy crawl source, 2.5 on a high-quality one). rate < 1
    downsamples (keep iff the id-hash uniform falls under rate);
    rate >= 1 emits floor(rate) full copies plus one more with
    probability frac(rate). Output (id, source, epoch) with epoch in
    [0, n_copies); re-salting re-rolls every decision. No shuffle,
    no state, no RNG — reruns and backfills produce identical
    samples at any scale.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(source_col).alias("source")
    )
    u = _id_hash("doc_id", salt) / F.lit(_HASH_SPAN)
    rate_map = (
        [
            F.element_at(
                F.create_map(
                    *[F.lit(x) for kv in rates.items() for x in (kv[0], float(kv[1]))]
                ),
                F.col("source"),
            )
        ]
        if rates
        else []
    )
    rate = F.coalesce(*rate_map, F.lit(float(default_rate)))
    n_copies = F.floor(rate) + (u < rate - F.floor(rate)).cast("long")
    # sequence(0, n-1) counts DOWN for n<=0 under ANSI; guard to an
    # empty array so rejected docs drop out of the explode.
    epochs = F.when(
        F.col("n") >= 1, F.sequence(F.lit(0).cast("long"), F.col("n") - 1)
    ).otherwise(F.array().cast("array<long>"))
    return base.withColumn("n", n_copies).select(
        "doc_id", "source", F.explode(epochs).alias("epoch")
    )


def shard_assign(
    docs: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> DataFrame:
    """Deterministic global shuffle + sharding for training-order
    serialization: shard = id-hash mod n_shards (MAP-ONLY), position
    = rank of (hash, id) within the shard. Reading shards round-robin
    replays one fixed pseudo-random permutation of the corpus; the
    only shuffle is the per-shard ranking window, which at 100 TB
    runs on the (id, hash) projection — never the payload — and each
    shard sorts independently."""
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .withColumn("h", _id_hash("doc_id", salt))
        .withColumn("shard", F.col("h") % n_shards)
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .select("doc_id", "shard", "pos")
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy sequence packing: within each group, walk docs in id
    order and fill bins of `budget` whitespace tokens; a doc that
    doesn't fit starts the next bin (oversized docs get their own).
    Returns (id, group, n_tokens, bin_idx); bin ids are per-group.

    Group independence is the parallelism: at 100 TB the group key is
    a hash bucket (or shard id), so every bin-fill scan is one
    Arrow batch of ints, and no group's packing waits on another."""
    import pandas as pd

    meta = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        token_count(text_col).alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, cur_bin, fill = [], -1, budget + 1
        for t in pdf["n_tokens"]:
            if fill + t > budget:
                cur_bin += 1
                fill = t
            else:
                fill += t
            bins.append(cur_bin)
        pdf["bin_idx"] = bins
        return pdf

    return (
        meta.groupBy("grp")
        .applyInPandas(pack, "doc_id long, grp string, n_tokens long, bin_idx long")
        .select(
            "doc_id",
            F.col("grp").alias(group_col),
            "n_tokens",
            "bin_idx",
        )
    )


def temperature_mixture(
    docs: DataFrame,
    temperature: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based mixture resampling: sampling probability per
    source q_s ∝ p_s^(1/T), the softmax-temperature convention —
    T=1 is proportional, T>1 flattens toward uniform (upweights rare
    sources; the multilingual-balancing use, e.g. q ∝ p^0.7 is
    T≈1.43), T<1 sharpens toward dominant sources. The per-source
    replication rate q_s·N/n_s derives FROM THE DATA in the same plan
    (two tiny aggregations over the source column, broadcast back; no
    driver collect, no config), then the same deterministic
    hash-replication as :func:`mixture_sample`.

    T=0.5 (the shipped default) computes the exponent as p·p — one
    IEEE multiply, bit-identical across engines, keeping the derived
    rates oracle-checkable; intermediate weights round to 6 like every
    float oracle in the suite. Any other T>0 uses pow(p, 1/T) —
    correct but float-library-dependent at the last ulp, so queries on
    that path register rows-only (the ann_ivf_trained precedent).

    Minimum representable share: weights round to 6 decimals, so a
    source with p^(1/T) below 5e-7 (T=0.5: share under ~7.1e-4) would
    round to wt=0 and silently vanish from the mixture entirely. The
    plan raises instead (in-plan guard, no driver collect); callers
    hitting it should bucket micro-sources into a composite source
    upstream.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(source_col).alias("source")
    )
    # ONE-SUBTREE rate derivation (r14 session 2, guide §5 / §2.4):
    # tot and swt previously lived in their own nested
    # BroadcastExchange subtrees (cnt -> broadcast(tot) -> w ->
    # broadcast(sw) -> rates), and each broadcast build re-executed
    # the per-source corpus aggregation — measured at sf0.1: 10
    # parquet scans / 28 HashAggregates / 0 ReusedExchange in one
    # plan, ~4 corpus aggregation passes where 1 suffices at scale.
    # Both totals are scalars over the sources-count-sized cnt frame,
    # so they compute as unpartitioned window sums over cnt instead:
    # the whole rates table is ONE subtree — one corpus aggregation,
    # one broadcast build, no cache to tie. The single-partition
    # window is safe by construction (one row per SOURCE, the same
    # tiny-frame bound the crossJoin(broadcast) design relied on).
    # Values are unchanged: identical expressions over identical
    # per-source rows; only the subtree sharing differs.
    cnt = base.groupBy("source").agg(F.count("*").alias("n_src"))
    # constant partition key: same single-partition execution the
    # tiny-frame bound already accepts, without WindowExec's
    # no-partition warning spamming every run
    wall = Window.partitionBy(F.lit(0))
    p = F.col("n_src") / F.col("n_tot")
    if abs(temperature - 0.5) <= 1e-12:
        wt_raw = F.round(p * p, 6)
    else:
        wt_raw = F.round(F.pow(p, F.lit(1.0 / temperature)), 6)
    wt_guarded = F.when(
        wt_raw <= 0,
        F.raise_error(
            F.concat(
                F.lit("temperature_mixture: source "),
                F.col("source"),
                F.lit(
                    " has p^(1/T) below the 6-dp weight quantum (wt=0); "
                    "merge micro-sources upstream or raise T"
                ),
            )
        ).cast("double"),
    ).otherwise(wt_raw)
    w = cnt.select(
        "source",
        "n_src",
        F.sum("n_src").over(wall).alias("n_tot"),
    ).select("source", "n_src", "n_tot", wt_guarded.alias("wt"))
    rates = w.select(
        "source",
        "wt",
        F.round(F.sum("wt").over(wall), 6).alias("swt"),
        "n_tot",
        "n_src",
    ).select(
        "source",
        F.round(
            F.col("wt") / F.col("swt") * F.col("n_tot") / F.col("n_src"), 6
        ).alias("rate"),
    )
    u = _id_hash("doc_id", salt) / F.lit(_HASH_SPAN)
    joined = base.join(F.broadcast(rates), "source").withColumn(
        "n",
        F.floor("rate")
        + (u < F.col("rate") - F.floor("rate")).cast("long"),
    )
    epochs = F.when(
        F.col("n") >= 1, F.sequence(F.lit(0).cast("long"), F.col("n") - 1)
    ).otherwise(F.array().cast("array<long>"))
    return joined.select("doc_id", "source", F.explode(epochs).alias("epoch"))


def weighted_sample(
    docs: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    strata_col: str | None = None,
    salt: str = "ws",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — the Efraimidis-
    Spirakis A-ES estimator: each row draws u = uniform(0,1) from its
    id hash and keys itself with ln(u)/w (order-equivalent to the
    textbook u^(1/w)); the top-k rows by key ARE an exact
    without-replacement sample with inclusion probability
    proportional to weight. The quality-weighted corpus-selection
    primitive ("keep the best 10M documents, weighted by quality
    score") that mixture_sample's per-source rates can't express.

    Deterministic (same id+salt -> same draw) and fully
    distributable:
    - global (strata_col=None): orderBy+limit compiles to
      TakeOrderedAndProject — every partition keeps its local top-k
      and only n_partitions*k rows ever move, never a full sort
      (plan-asserted in tests);
    - per-stratum: one shuffle on the stratum, rank window, same
      guarantee per group. At 100 TB run it on the (id, weight,
      stratum) projection — never the payload — and join the winners
      back.

    The ranking key rounds to 6 dp with the id as tiebreak (the
    suite's float-oracle convention): ln() differs from other engines
    in the last ulp, and rounding + a total tiebreak keeps the
    selected SET engine-independent. Weights must be > 0 — a
    non-positive weight raises in-plan (the temperature_mixture
    guard discipline), because ln(u)/w would silently flip its sign
    and sample the WORST rows.
    """
    u = (_id_hash(id_col, salt) + F.lit(0.5)) / F.lit(_HASH_SPAN)
    w = F.col(weight_col).cast("double")
    key_raw = F.round(F.log(u) / w, 6)
    skey = F.when(
        w <= 0,
        F.raise_error(
            F.concat(
                F.lit("weighted_sample: non-positive weight for "),
                F.col(id_col).cast("string"),
                F.lit(" — ln(u)/w flips sign at w<=0; filter or fix weights"),
            )
        ).cast("double"),
    ).otherwise(key_raw)
    keyed = docs.withColumn("skey", skey)
    if strata_col is None:
        return keyed.orderBy(F.col("skey").desc(), F.col(id_col)).limit(k)
    wnd = Window.partitionBy(strata_col).orderBy(
        F.col("skey").desc(), F.col(id_col)
    )
    return (
        keyed.withColumn("_rnk", F.row_number().over(wnd))
        .filter(F.col("_rnk") <= k)
        .drop("_rnk")
    )
