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

from nerd_spark.functions.text import fingerprint, tokens
from nerd_spark.operators.cacheutil import tie_unpersist


def exact_dedup(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Group identical (normalized) texts: fingerprint, member count,
    canonical id (min). One shuffle on the 32-char hash."""
    return (
        docs.select(F.col(id_col).alias("id"), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("id").alias("canonical_id"))
    )


def _spread(docs: DataFrame) -> DataFrame:
    """Round-robin small inputs across the cluster before CPU-heavy
    map work. A corpus that arrives in fewer partitions than cores
    (one small parquet file at test SF; a handful of coalesced splits
    after a selective pushed-down filter at 100 TB) would otherwise
    run the whole shingle+hash stage serially — measured 10x wall on
    local[32]. At full scale the input already has thousands of
    splits and this is a no-op. The probe is staged cheapest-first:

    1. inputFiles() (pure FileIndex metadata, no job): fewer files
       than cores -> repartition.
    2. many files: Spark packs small files into FEWER splits, so file
       count over-states parallelism — but packing is bounded by
       maxPartitionBytes with an openCostInBytes pad per file, so the
       split count is provably >= n_files*openCost/maxPartitionBytes,
       and otherwise a 3-file FS-stat sample estimates it. Either way
       the wide case settles WITHOUT the per-call plan->RDD
       conversion it used to pay (ADVICE r6).
    3. only the still-ambiguous cases — [] files (in-memory /
       checkpointed frames are NOT guaranteed shuffle-width: a
       localCheckpoint keeps its upstream partitioning) or a
       tiny-file estimate below `par` — pay the true post-packing
       split count via .rdd.getNumPartitions (driver-side plan
       conversion only, no job).
    """
    spark = docs.sparkSession
    par = spark.sparkContext.defaultParallelism
    files = docs.inputFiles()
    n_files = len(files)
    if 0 < n_files < par:
        return docs.repartition(par)
    if n_files >= par:
        open_cost = _bytes_conf(spark, "spark.sql.files.openCostInBytes", 4 << 20)
        max_pb = _bytes_conf(
            spark, "spark.sql.files.maxPartitionBytes", 128 << 20
        )
        if n_files * open_cost >= par * max_pb:
            return docs  # wide from the per-file packing pad alone
        try:
            from nerd_spark.sources import fsutil

            sample = files[:: max(1, n_files // 3)][:3]
            # MIN of the sample — but even the min is only an
            # ESTIMATE of the per-file floor: unsampled files can be
            # smaller still, so n_files*min is not a true lower bound
            # on total bytes (ADVICE r7). Treat it as a screen only:
            # skip the exact probe ONLY when the estimate clears the
            # width threshold with a 4x margin (a directory would
            # need its unsampled files 4x smaller than the sampled
            # min on average to be misclassified); anything closer
            # falls through to the exact split-count probe below.
            floor = min(fsutil.size(spark, f) for f in sample)
        except Exception:
            floor = 0.0
        if n_files * (floor + open_cost) >= 4 * par * max_pb:
            return docs
    if docs.rdd.getNumPartitions() < par:
        return docs.repartition(par)
    return docs


def waist_checkpoint(df: DataFrame, min_bytes: int | None = None) -> DataFrame:
    """Materialize a multi-consumer pipeline waist — but only when the
    source corpus is big enough for the saved recomputation to beat
    the materialization's own job cost.

    The funnel/tf waists (corpus_curation_v2/v3, keywords._tf_waist)
    feed 2-3 downstream actions; at the 80x design point an eager
    localCheckpoint saves whole re-executions of the tokenize/regex
    stages (measured: v3 10.3 -> 5.9 s, tfidf 3 corpus scans -> 1).
    At test SF the same checkpoint LOSES: each extra eager job costs
    ~0.3 s of fixed scheduling/serialization while a redundant scan
    pass costs milliseconds (measured: v3 cold 14.1 s with vs 7.2 s
    without at sf0.1). Decision: estimate the source bytes from the
    plan's own FileIndex (``inputFiles`` + a sampled FS stat — the
    same probe discipline as :func:`_spread`) and skip the checkpoint
    under ``spark.nerd.waistMinBytes`` (default 8 MiB of source
    parquet, ~10x the sf0.1 corpus and ~1/6 of the measured-win 80x
    point). Unknown size (in-memory lineage, stat failure) -> assume
    big and checkpoint: the scale path must never silently degrade.

    On a cluster, .checkpoint()/a parquet write is the fault-tolerant
    equivalent of the localCheckpoint taken here.
    """
    spark = df.sparkSession
    if min_bytes is None:
        min_bytes = _bytes_conf(spark, "spark.nerd.waistMinBytes", 8 << 20)
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files:
        from nerd_spark.sources import fsutil

        n = len(files)
        sample = files[:: max(1, n // 8)][:8]
        try:
            sizes = [fsutil.size(spark, f) for f in sample]
            est = int(sum(sizes) / len(sizes) * n)
            if est < min_bytes:
                return df
        except Exception:
            pass
    return df.localCheckpoint()


def _bytes_conf(spark, key: str, default: int) -> int:
    """A byte-valued SQL conf ('134217728b', '128m', plain int)."""
    import re

    raw = str(spark.conf.get(key, str(default))).strip().lower()
    m = re.fullmatch(r"(\d+)\s*([bkmgt]?)b?", raw)
    if not m:
        return default
    mult = {"": 1, "b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    return int(m.group(1)) * mult[m.group(2)]


def shingle_arrays(
    docs: DataFrame, id_col="doc_id", text_col="text", k=3
) -> DataFrame:
    """(id, sarr: array<string>) — k-word shingles per doc, MAP-ONLY.

    Two projections on purpose: the token split materializes as its
    own attribute first, and the shingle transform references that
    attribute many times. CollapseProject refuses to inline a
    non-cheap multi-referenced expression into the lambda, so the
    regex split runs once per row (inlining it re-evaluates the split
    per lambda element — measured 4x slower). Docs with fewer than k
    tokens keep an empty array; callers filter as needed.

    This replaces a posexplode+window formulation: shingling is now
    embarrassingly parallel with NO shuffle, which is the difference
    between a map stage and a full token-row sort at 100 TB.
    """
    base = docs.select(F.col(id_col).alias("id"), tokens(text_col).alias("toks"))
    n = F.size(F.col("toks")) - (k - 1)
    sh = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("toks"), (i + j).cast("int")) for j in range(k)]
        ),
    )
    # sequence(1, n<1) would count DOWN under ANSI — guard to empty.
    return base.select(
        "id",
        F.when(n >= 1, sh).otherwise(F.array().cast("array<string>")).alias("sarr"),
    )


def shingle_rows(
    docs: DataFrame, id_col="doc_id", text_col="text", k=3, distinct=True
) -> DataFrame:
    """k-word shingles per doc, exploded to rows (map-only explode of
    `shingle_arrays` — no window/shuffle). distinct=True dedups WITHIN
    each doc via array_distinct before the explode — still map-only;
    a .distinct() here would shuffle the whole corpus shingle set for
    a dedup the per-doc array already decides."""
    arr = shingle_arrays(docs, id_col, text_col, k)
    if distinct:
        arr = arr.select("id", F.array_distinct("sarr").alias("sarr"))
    return arr.select("id", F.explode("sarr").alias("s"))


def _pair_jaccard(
    cand: DataFrame,
    sets: DataFrame,
    broadcast_max_pairs: int = 2_000_000,
    over: bool | None = None,
) -> DataFrame:
    """Exact Jaccard for candidate (a_id, b_id) pairs.

    ``over``: the caller's already-measured verdict of the same
    bounded probe. A caller that has ALREADY pinned ``cand`` (e.g. a
    localCheckpoint) and counted it against the bound for its own
    broadcast decision passes the verdict through so this function
    does not persist and probe a second time — the probe is a whole
    extra job launch per call, pure overhead when the answer is
    known. With ``over`` given the caller owns the pin; nothing is
    persisted or tied here. CONTRACT (ADVICE r13): the verdict is
    only valid if it was measured against THIS function's
    ``broadcast_max_pairs`` bound on the SAME pinned frame — a
    verdict from a different bound would silently mis-choose
    broadcast vs merge-join. Callers must pass their measured bound
    alongside (the one caller, incremental_minhash_pairs_indexed,
    forwards both).

    `sets` is (id, ss: array<string> distinct shingles) — computed
    map-side from shingle arrays. Candidates are rare by
    construction, so the common plan broadcasts `cand` and both joins
    stream `sets` map-side: verification never shuffles the corpus.

    r14 NEGATIVE RESULT (do not revisit without a new mechanism):
    moving the array_distinct+size projection ABOVE the broadcast
    joins — so only candidate rows pay the per-row array work, raw
    arrays below — measured a wash-to-LOSS at the 16x replica
    (old 4.6-9.8 s vs new 8.2-9.6 s interleaved, pair sets
    identical). The candidate count there (39k pairs) is comparable
    to the corpus (80k docs), so the "candidates-only" saving is
    ~nothing while raw arrays riding two joins (and the second
    join's build side) cost more. The pre-join distinct stays.

    The broadcast decision is made from a MEASURED bound, not
    Catalyst's estimate (r7 verdict #3, falsified at the 160x stress
    point): on a degenerate corpus — giant near-dup cliques; the
    replicated scale corpus is the worst case, every doc in an
    N-replica clique — `cand` grows quadratically in clique size
    while the optimizer's post-self-join size estimate stays small,
    so "let Catalyst choose" picked a broadcast that OOM'd the
    driver (observed: 127M pairs at 160x, broadcast build death).
    Now: cache `cand`, probe `limit(max+1).count()` (early-stops at
    the bound, so the probe is O(max) even when cand is huge), and
    - under the bound: pin F.broadcast(cand) — ≤ ~32 MB by
      construction, the map-side plan the corpus side needs;
    - over it: forbid broadcast with a merge hint (sort-merge joins
      spill; a shuffled-hash build of a 127M-pair side could itself
      OOM an executor) — the verify degrades to a bounded shuffled
      join of (id, shingle-set) rows, slower but it always completes.
    """
    sets = sets.select("id", "ss", F.size("ss").cast("long").alias("n"))
    pins = []
    if over is None:
        cand = cand.persist()  # probe + verify join; tied to the result below
        over = cand.limit(broadcast_max_pairs + 1).count() > broadcast_max_pairs
        pins = [cand]
    if over:
        # merge-join regime: the verify sort-merges a full shingle
        # array per pair side — encode strings to dense longs first
        # (same bijection and rationale as _pair_scores_rare's
        # over paths; see _encode_hot_longs). The encode is
        # doc-count-sized; the avoided cost is pair-count-sized
        # (e.g. the 160x minhash stress corpus: ~127M pairs each
        # dragging two ~52-string arrays through two sorts plus a
        # string-hash array_intersect per pair).
        enc = _encode_hot_longs(
            sets.select("id", "n", F.col("ss").alias("hot"))
        )
        sets = enc.select("id", F.col("hot").alias("ss"), "n")
        pins = pins + [enc]
    a = sets.select(F.col("id").alias("a_id"), F.col("ss").alias("sa"), F.col("n").alias("na"))
    b = sets.select(F.col("id").alias("b_id"), F.col("ss").alias("sb"), F.col("n").alias("nb"))
    c = F.size(F.array_intersect("sa", "sb"))
    probe = cand.hint("merge") if over else F.broadcast(cand)
    return tie_unpersist(
        probe.join(a, "a_id")
        .join(b, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(c / (F.col("na") + F.col("nb") - c), 6).alias("jaccard"),
        ),
        *pins,
    )


def _rare_shingle_candidates(docs, id_col, text_col, k, max_df, sarr=None):
    """ONE shingle scan shared by every rare-shingle similarity
    verify (jaccard_dedup, containment_dedup, and the combined
    jaccard_containment_pairs): shingle the corpus, df-cap to kill the
    hot-shingle blowup, self-join the rare rows into candidate pairs.
    Returns (sarr CACHED, rare CACHED, cand, aset) — callers must tie
    the two cached frames to their result (cacheutil.tie_unpersist).

    r13 verify restructure (guide §1.2 step 1 / §2.3): the exact
    intersection |A ∩ B| partitions by document frequency,

        |A ∩ B| = |A ∩ B ∩ rare| + |A ∩ B ∩ hot|,

    and the RARE term is a by-product of candidate generation itself —
    grouping the rare-shingle self-join by pair counts exactly the
    shared rare shingles — while the HOT term intersects per-doc
    hot-shingle projections that are tiny by construction (a hot
    shingle lives in > max_df docs, so a corpus has at most
    shingle_rows/max_df of them; measured sf0.1: 59 hot of 27,213
    distinct, 0.26 avg/doc vs 52 full-set avg). The per-pair verify
    therefore stops re-intersecting two ~full shingle arrays
    (O(|A|+|B|) string hashing per pair, the dominant cost of the
    containment stage — 12.3 s of corpus_curation_v4's 23 s at sf0.1)
    and the verify join stops shipping full string arrays per side.
    Also map-only strictly less work upstream: the self-join runs on
    per-doc DISTINCT shingle rows (in-doc duplicates previously
    multiplied join output before the pair-distinct).

    ``cand`` is (a_id, b_id, rc) — rc = |A ∩ B ∩ rare|; ``aset`` is
    (id, n, hot) — n = |distinct shingles|, hot = the per-doc
    hot-shingle projection (empty array when none).

    SIZE-GATED like :func:`waist_checkpoint` (same measured-crossover
    rationale): below ``spark.nerd.rareVerifyMinBytes`` of source
    parquet (default 8 MiB) the decomposition's fixed costs — the
    rare_per_doc shuffle and the aset cache materialization — exceed
    what the per-pair savings return (interleaved A/B at sf0.1:
    old 3.5–4.1 s vs decomposed 4.1–4.7 s warm; at a 16x replica dir
    the decomposition wins 7.8–11.5 s → 4.1–5.6 s), so the small
    path keeps rc unused (zeroed) and serves the FULL distinct array
    as ``hot`` — the verify then intersects full sets map-side from
    the cached sarr exactly as before, through the same downstream
    code. Unknown size (in-memory frames, e.g. corpus_curation_v4's
    checkpointed survivor frame) takes the scale path: the scale path
    must never silently degrade — and an r13 A/B that plumbed a
    corpus-size prior through to flip v4's stage small measured the
    small path SLOWER in-pipeline (see the corpus_curation_v4 call
    site), so unknown→scale is the measured choice too.

    ``sarr`` (optional): a precomputed (id, sarr) shingle frame — a
    pipeline that already shingled a superset corpus (corpus_curation
    v4's LSH stage) passes its cached frame filtered to ``docs`` and
    the tokenize/transform pass is not paid again. The CALLER owns
    that cache; this function only creates (and the operator only
    ties) what it built itself.

    Gate caveat (ADVICE r13): estimate_input_bytes sums the FULL
    underlying parquet files, so a heavily filtered slice of a large
    table overestimates and lands on the scale path. That is the
    measured-safe direction (unknown/over -> scale; the small path is
    only a fixed-cost shave), a perf prior only — never a correctness
    input."""
    from nerd_spark.sources.fsutil import estimate_input_bytes

    spark = docs.sparkSession
    min_bytes = _bytes_conf(spark, "spark.nerd.rareVerifyMinBytes", 8 << 20)
    est = estimate_input_bytes(docs)
    small = est is not None and est < min_bytes
    if sarr is None:
        sarr = shingle_arrays(_spread(docs), id_col, text_col, k).cache()
    sd = sarr.select("id", F.array_distinct("sarr").alias("ss"))
    sh = sd.select("id", F.explode("ss").alias("s"))  # distinct (id,s)
    dfc = sh.groupBy("s").agg(F.count("*").alias("df"))
    rare = sh.join(dfc.filter(F.col("df") <= max_df).select("s"), "s").cache()
    cand = (
        rare.alias("x")
        .join(rare.alias("y"), "s")
        .filter(F.col("x.id") < F.col("y.id"))
        .groupBy(
            F.col("x.id").alias("a_id"), F.col("y.id").alias("b_id")
        )
        .agg(
            (F.count("*") * F.lit(0 if small else 1))
            .cast("long")
            .alias("rc")
        )
    )
    if small:
        # full distinct sets ride as `hot` (rc zeroed above): verify
        # intersects full arrays map-side from the cached sarr — the
        # pre-decomposition shape, no extra shuffle, no extra cache
        aset = sd.select(
            "id", F.size("ss").cast("long").alias("n"),
            F.col("ss").alias("hot"),
        )
        return sarr, rare, cand, aset
    # per-doc hot projection WITHOUT a second df pass: hot = the doc's
    # distinct shingles minus its (cached) rare rows — one
    # array_except per DOC, not per pair. aset is doc-count-sized
    # (id, long, tiny array) and consumed by both verify-join sides,
    # so it is cached; _pair_scores_rare ties it to the result.
    rare_per_doc = rare.groupBy("id").agg(F.collect_list("s").alias("rl"))
    aset = (
        sd.join(rare_per_doc, "id", "left")
        .select(
            "id",
            F.size("ss").cast("long").alias("n"),
            F.array_except(
                "ss",
                F.coalesce("rl", F.array().cast("array<string>")),
            ).alias("hot"),
        )
        .cache()
    )
    return sarr, rare, cand, aset


def _encode_hot_longs(aset: DataFrame) -> DataFrame:
    """(id, n, hot: array<string>) -> CACHED (id, n, hot: array<bigint>)
    with hot strings bijectively mapped to dense longs — the r14
    session-2 pre-shuffle encode for pair-sized MERGE-join verifies
    (guide §2.3 narrower types / §8 lightweight proxy).

    Why: when the measured pair count exceeds the broadcast bound,
    the verify degrades to sort-merge joins that ship a hot array per
    pair side AND intersect string arrays per pair. Stage profile at
    the 16x replica (audits/stage_profile_r14.py): the containment
    verify's final stage read 2.83 GB of ~600 B string arrays and
    burned 3,245 CPU-s in 15M string array_intersects; the jaccard
    pass-2 equivalent read 1.82 GB / 534 CPU-s. Encoding each
    distinct hot shingle as a long cuts the per-element payload
    ~600->~170 B and replaces per-pair string hashing with long
    compares. Doc-count-sized work (explode + one tiny window + one
    groupBy) buys pair-count-sized savings.

    Exactness: the map s -> hid is injective — hid = bucket << 40 |
    row_number within bucket, buckets disjoint by construction and
    row_number unique within its bucket (rn < 2^40 needs > 10^12 hot
    shingles per bucket to overflow) — so per-doc encoded sets have
    the same cardinality and pairwise |enc_a INTERSECT enc_b| =
    |hot_a INTERSECT hot_b|. No hash-collision caveat: xxhash64 only
    picks the bucket; identity comes from the exact per-bucket rank.
    The bucketed window avoids a single-partition global sort: the
    hot vocabulary is bounded by shingle_rows/max_df but can still be
    large at scale, and 4096 buckets keep each rank partition small.

    Deterministic across recomputation (unlike
    monotonically_increasing_id), so a cache-evicted partition
    re-derives the SAME ids — cross-partition consistency of the
    encoding never depends on cache residency. Callers must tie the
    returned cache to their result."""
    from pyspark.sql import Window

    hv = (
        aset.select(F.explode("hot").alias("s"))
        .distinct()
        .select("s", F.pmod(F.xxhash64("s"), F.lit(4096)).alias("bk"))
        .select(
            "s",
            (
                F.shiftleft(F.col("bk"), 40)
                + F.row_number().over(Window.partitionBy("bk").orderBy("s"))
            ).cast("long").alias("hid"),
        )
    )
    ids = (
        aset.select("id", F.explode("hot").alias("s"))
        .join(hv, "s")
        .groupBy("id")
        .agg(F.collect_list("hid").alias("hl"))
    )
    return (
        aset.select("id", "n")
        .join(ids, "id", "left")
        .select(
            "id",
            "n",
            F.coalesce("hl", F.array().cast("array<bigint>")).alias("hot"),
        )
        .cache()
    )


def _pair_scores_rare(
    cand: DataFrame,
    aset: DataFrame,
    broadcast_max_pairs: int = 2_000_000,
    j_min: float | None = None,
    c_min: float | None = None,
):
    """Exact (jaccard, containment) columns for rare-shingle candidate
    pairs from the decomposed intersection (see
    :func:`_rare_shingle_candidates`): c = rc + |hot_a ∩ hot_b|.
    Same measured-bound broadcast discipline and cache tie as
    :func:`_pair_jaccard`; returns (scored_df, pins) — the caller
    hands the pins (the persisted cand + the cached aset) to
    tie_unpersist along with its own.

    r14 upper-bound prune (guide §8 "decide with small rows" / §2.3):
    ``j_min``/``c_min`` are the caller's FINAL output thresholds. The
    intersection is bounded above by c_ub = rc + min(|hot_a|, |hot_b|)
    (every shared shingle is shared-rare or shared-hot, and shared-hot
    ≤ either hot set), and both scores are monotone in c with
    c_ub ≤ min(na, nb) (rc ≤ na−|hot_a| and min ≤ |hot_a|, same for
    b), so a pair whose ROUNDED upper-bound scores miss every given
    threshold provably cannot appear in the caller's output — rounding
    to the same 6 dp keeps the comparison exact because round() is
    monotone. Pairs are pruned on (na, nb, |hot|) alone, BEFORE any
    hot array is shipped or intersected. When the measured pair count
    exceeds the broadcast bound this becomes a two-pass verify: pass 1
    joins cand to the doc-count-sized (id, n, nh) stats projection
    (tiny rows; AQE sees the real sizes — no merge pin needed on a
    16-byte payload), pass 2 re-applies the measured broadcast
    discipline to the surviving pairs (usually far under the bound)
    and intersects hot arrays only for them — the heavy arrays never
    ride a pair-sized sort. Measured at a 16x replica: 15.0M candidate
    pairs, verify stage 99 s (two SMJ sorts carrying avg-20-string hot
    arrays per side) → survivors only. Callers that filter the
    returned frame at these thresholds get identical output; passing
    no threshold keeps every pair (the pre-r14 contract)."""
    def _ab(src: DataFrame):
        # src is aset or its long-encoded twin (_encode_hot_longs):
        # every downstream expression (size, array_intersect) is
        # element-type-agnostic and the encode preserves set algebra
        a = src.select(
            F.col("id").alias("a_id"), F.col("n").alias("na"),
            F.col("hot").alias("ha"),
        )
        b = src.select(
            F.col("id").alias("b_id"), F.col("n").alias("nb"),
            F.col("hot").alias("hb"),
        )
        return a, b

    cand = cand.persist()  # probe + verify join; tied below
    over = cand.limit(broadcast_max_pairs + 1).count() > broadcast_max_pairs
    prune = j_min is not None or c_min is not None
    if over and prune and c_min is not None:
        # The containment bound c_ub/min(na,nb) is only selective when
        # hot sets are small next to full sets (then c_ub ≈ rc): with a
        # large hot fraction c_ub → min(na,nb) and the bound keeps
        # EVERYTHING (measured on the 16x letter-rotation replica dir,
        # hot_frac 0.38: containment-0.9 survivors 14,971,942 of
        # 14,971,942 — the two-pass verify then only ADDS a pass; the
        # jaccard bound on the same data kept 36% and won 2-4x). For an
        # OR-caller a weak c-side makes the whole OR vacuous, so the
        # prune is disabled outright, not just the c term — the keep
        # filter must stay a NECESSARY condition for the caller's
        # output. One tiny agg on the (doc-count-sized, cached,
        # needed-anyway) aset decides from the measured fraction; real
        # corpora sit far under the gate (sf0.1: 59 hot shingles of
        # 27,213 distinct, hot_frac ~0.005).
        hs = aset.agg(
            F.sum("n").alias("sn"),
            F.sum(F.size("hot")).alias("sh"),
        ).first()
        hot_frac = (hs["sh"] or 0) / max(hs["sn"] or 1, 1)
        if hot_frac > 0.2:
            prune = j_min is not None and c_min is None

    def _ub_keep(c_ub):
        keep = F.lit(False)
        if j_min is not None:
            keep = keep | (
                F.round(c_ub / (F.col("na") + F.col("nb") - c_ub), 6)
                >= F.lit(j_min)
            )
        if c_min is not None:
            keep = keep | (
                F.round(c_ub / F.least("na", "nb"), 6) >= F.lit(c_min)
            )
        return keep

    c = F.col("rc") + F.size(F.array_intersect("ha", "hb"))
    exact = [
        "a_id",
        "b_id",
        F.round(c / (F.col("na") + F.col("nb") - c), 6).alias("jaccard"),
        F.round(c / F.least("na", "nb"), 6).alias("containment"),
    ]
    if over and prune:
        # pass 1 — bounds on tiny rows: no hint on either side (the
        # stats side is doc-count-sized 16-byte rows; AQE converts
        # from the REAL exchange size, the measured discipline's
        # estimate distrust does not apply)
        nst_a = aset.select(
            F.col("id").alias("a_id"),
            F.col("n").alias("na"),
            F.size("hot").alias("nha"),
        )
        nst_b = aset.select(
            F.col("id").alias("b_id"),
            F.col("n").alias("nb"),
            F.size("hot").alias("nhb"),
        )
        c_ub = F.col("rc") + F.least("nha", "nhb")
        surv = (
            cand.join(nst_a, "a_id")
            .join(nst_b, "b_id")
            .filter(_ub_keep(c_ub))
            .select("a_id", "b_id", "rc")
            .persist()
        )
        over2 = (
            surv.limit(broadcast_max_pairs + 1).count() > broadcast_max_pairs
        )
        if over2:
            # survivors still exceed the bound: the verify is a
            # pair-sized merge join shipping a hot array per side —
            # encode to longs first (see _encode_hot_longs)
            enc = _encode_hot_longs(aset)
            a, b = _ab(enc)
            scored = (
                surv.hint("merge").join(a, "a_id").join(b, "b_id")
                .select(*exact)
            )
            return scored, [cand, surv, enc, aset]
        a, b = _ab(aset)
        scored = (
            F.broadcast(surv).join(a, "a_id").join(b, "b_id").select(*exact)
        )
        return scored, [cand, surv, aset]
    if over:
        # merge-join regime (includes the hot-frac-gated containment
        # path): arrays ride two pair-sized sorts — encode to longs
        enc = _encode_hot_longs(aset)
        a, b = _ab(enc)
        probe = cand.hint("merge")
        pins = [cand, enc, aset]
    else:
        a, b = _ab(aset)
        probe = F.broadcast(cand)
        pins = [cand, aset]
    joined = probe.join(a, "a_id").join(b, "b_id")
    if prune:
        # broadcast path: same joins, but the bound filter sits
        # between the join and the intersect projection so pruned
        # rows never pay the array_intersect (one codegen stage)
        joined = joined.filter(
            _ub_keep(F.col("rc") + F.least(F.size("ha"), F.size("hb")))
        )
    return joined.select(*exact), pins


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
    sarr, rare, cand, aset = _rare_shingle_candidates(
        docs, id_col, text_col, k, max_df
    )
    scored, pins = _pair_scores_rare(cand, aset, j_min=threshold)
    return tie_unpersist(
        scored.filter(F.col("jaccard") >= threshold).select(
            "a_id", "b_id", "jaccard"
        ),
        *pins,
        sarr,
        rare,
    )


def jaccard_containment_pairs(
    docs: DataFrame,
    id_col="doc_id",
    text_col="text",
    k=3,
    jaccard_threshold=0.8,
    containment_threshold=0.9,
    max_df=20,
) -> DataFrame:
    """BOTH similarity measures from one shared scan: (a_id, b_id,
    jaccard, containment) for every candidate pair passing EITHER
    threshold. When a curation pipeline wants Jaccard near-dups AND
    subset-copy containment (corpus_curation_v4), running
    jaccard_dedup + containment_dedup separately pays the shingle
    scan, the df-cap aggregation, and the candidate self-join TWICE
    for byte-identical intermediates — here one candidate frame
    verifies once and both scores come out of the same
    array_intersect (the denominators are the only difference).
    Per-measure filters reproduce the standalone operators exactly
    (pytest-pinned)."""
    sarr, rare, cand, aset = _rare_shingle_candidates(
        docs, id_col, text_col, k, max_df
    )
    scored, pins = _pair_scores_rare(
        cand, aset, j_min=jaccard_threshold, c_min=containment_threshold
    )
    return tie_unpersist(
        scored.filter(
            (F.col("jaccard") >= jaccard_threshold)
            | (F.col("containment") >= containment_threshold)
        ),
        *pins,
        sarr,
        rare,
    )


def containment_dedup(
    docs: DataFrame,
    id_col="doc_id",
    text_col="text",
    k=3,
    threshold=0.9,
    max_df=20,
    sarr=None,
) -> DataFrame:
    """ASYMMETRIC near-dup pairs by shingle containment
    |A ∩ B| / min(|A|, |B|) >= threshold — the measure that catches a
    short document embedded in a long one (quoted snippets, prefixed
    boilerplate wrappers, chat logs pasted into articles), which
    symmetric Jaccard structurally misses: a 50-shingle doc fully
    contained in a 5000-shingle doc has containment 1.0 but Jaccard
    ~0.01. For training-data curation this is the dedup that removes
    subset copies a Jaccard threshold can never reach.

    Candidate generation and scale shape are exactly
    :func:`jaccard_dedup`'s (rare-shingle equi-join, df-capped to
    kill the hot-shingle blowup; probe-bounded broadcast verify);
    only the verify denominator differs, so containment(a, b) >=
    jaccard(a, b) row-for-row and every Jaccard pair at a threshold
    is also a containment pair at that threshold (property-tested).

    ``sarr``: optional precomputed shingle frame (caller-owned cache;
    see :func:`_rare_shingle_candidates`).
    """
    own = sarr is None
    sarr, rare, cand, aset = _rare_shingle_candidates(
        docs, id_col, text_col, k, max_df, sarr=sarr
    )
    scored, pins = _pair_scores_rare(cand, aset, c_min=threshold)
    ties = pins + [rare] + ([sarr] if own else [])
    return tie_unpersist(
        scored.filter(F.col("containment") >= threshold).select(
            "a_id", "b_id", "containment"
        ),
        *ties,
    )


def minhash_lsh_dedup(
    spark: SparkSession,
    docs: DataFrame,
    id_col="doc_id",
    text_col="text",
    k=3,
    n_bands=4,
    rows_per_band=3,
    threshold=0.5,
    sarr=None,
) -> DataFrame:
    """Banded MinHash LSH near-dup pairs, verified by exact Jaccard.

    Min-hash family: one md5 per shingle split into 32-bit halves
    (h1, h2), then g_i = (h1 + i*h2) mod 2^32 (Carter-Wegman) — each
    g_i orders shingles pseudo-randomly, at one digest per shingle
    instead of one per (shingle, i). A band
    signature concatenates rows_per_band hashes, so two docs collide
    in a band with probability j^r (not j — with r=1 every slightly
    similar pair collides and candidate generation degenerates to
    all-pairs). n_bands=4 x r=3 catches j>=0.5 w.h.p. while keeping
    random-pair collisions ~j^3.

    All 12 hashes compute as parallel min-aggregates in ONE shuffle
    over exploded shingle rows (duplicate shingles don't affect a
    min, so no dedup shuffle; partial aggregation collapses each map
    partition to one row per doc before the exchange). An
    alternative map-only formulation (12x transform/array_min over
    the per-doc shingle array) measured 3x SLOWER: each transform
    materializes a full md5-string array per doc, while the hash-agg
    streams shingles through codegen'd min buffers. The only cached
    artifact is the doc-level shingle array (one row per doc — far
    smaller than exploded rows), reused map-side for Jaccard verify.
    This is the 100 TB dedup path: one corpus shuffle for signatures,
    one band-bucket equi-join, never all-pairs.

    ``sarr``: optional precomputed shingle frame (caller-owned cache;
    see :func:`_rare_shingle_candidates`).
    """
    own = sarr is None
    if sarr is None:
        sarr = shingle_arrays(_spread(docs), id_col, text_col, k).cache()
    mh = minhash_band_table(sarr, n_bands, rows_per_band)
    mh = mh.cache()  # tiny (docs x bands); self-join below would recompute it
    cand = (
        mh.alias("x")
        .join(mh.alias("y"), ["b", "h"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a_id"), F.col("y.id").alias("b_id"))
        .distinct()
    )
    sets = sarr.select("id", F.array_distinct("sarr").alias("ss"))
    pj = _pair_jaccard(cand, sets)
    # re-tie: the filter below is a new handle; without this the
    # intermediate dies at return and drops the candidate pin early
    ties = [pj, mh] + ([sarr] if own else [])
    return tie_unpersist(pj.filter(F.col("jaccard") >= threshold), *ties)


def minhash_band_table(
    sarr: DataFrame, n_bands: int = 4, rows_per_band: int = 3
) -> DataFrame:
    """(id, b, h) banded MinHash signatures from per-doc shingle
    arrays — the persistable LSH index. Carter-Wegman universal
    family: ONE md5 per shingle, split into two 32-bit halves h1/h2,
    then g_i = (h1 + i*h2) mod 2^32 — same min-hash guarantees as i
    independent salted digests at 1/12th the hashing cost (measured:
    the 12-salted-md5 formulation spent ~2.2 s of the sf0.1 run in
    this one stage). All n_bands*rows_per_band hashes compute as
    parallel min-aggregates in ONE shuffle over exploded shingle
    rows; the hex-parse mirrors in the oracle exactly.
    """
    n_hashes = n_bands * rows_per_band
    sh = sarr.select("id", F.explode("sarr").alias("s"))
    m = F.md5("s")
    sh2 = sh.select(
        "id",
        F.conv(F.substring(m, 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(m, 9, 8), 16, 10).cast("long").alias("h2"),
    )
    mh_wide = sh2.groupBy("id").agg(
        *[
            F.min((F.col("h1") + i * F.col("h2")) % F.lit(2**32)).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    )
    band_sigs = [
        F.md5(
            F.concat_ws(
                "|",
                *[
                    F.col(f"h{b * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            )
        ).alias(f"sig{b}")
        for b in range(n_bands)
    ]
    return (
        mh_wide.select("id", *band_sigs)
        .select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(b).alias("b"), F.col(f"sig{b}").alias("h"))
                        for b in range(n_bands)
                    ]
                )
            ).alias("bh"),
        )
        .select("id", F.col("bh.b").alias("b"), F.col("bh.h").alias("h"))
    )


def minhash_cluster_edges(
    spark: SparkSession,
    docs: DataFrame,
    id_col="doc_id",
    text_col="text",
    k=3,
    n_bands=4,
    rows_per_band=3,
    threshold=0.5,
    star_rounds=3,
) -> DataFrame:
    """Cluster-oriented near-dup candidate edges: LINEAR in clique
    depth where the pair path is quadratic (r9 verdict #1).

    :func:`minhash_lsh_dedup`'s contract is every verified PAIR —
    within an LSH band bucket of m mutually-similar docs that is
    m(m-1)/2 candidate rows, and on deep replica cliques (the 320x
    stress corpus holds 32-deep ones) the pair OUTPUT itself is the
    quadratic cost both engines pay. Cluster consumers (dedup_clusters
    / best-of-cluster survivors / leakage-safe splits) only need
    CONNECTIVITY, so per bucket this emits the (member -> bucket-min)
    STAR — m-1 edges — and Jaccard-verifies those. Members whose star
    edge FAILS verification re-star among themselves within the
    bucket (a bucket mixing several similarity groups resolves one
    group per round; each round strictly shrinks the residue by at
    least its root); after ``star_rounds`` rounds the residue — by
    then >= star_rounds groups deep in one bucket, i.e. tiny — falls
    back to all-pairs verification so dissimilar stragglers still
    pair up exactly.

    Semantics: returns (a_id, b_id, jaccard) edges whose connected
    components equal the pair path's whenever within-bucket
    similarity at the threshold is transitive across the chosen roots
    (replica/near-replica cliques — the case whose cost motivates
    this operator; hash-match with the pair-based clusters is
    oracle-checked at test scale). For adversarial buckets where x~y
    but neither ~ an intermediate the paths can split a component —
    consumers needing the exact pair graph keep
    :func:`minhash_lsh_dedup`, whose contract is unchanged.

    Cost at 100 TB: per round, one (b, h) shuffle of the (residual)
    band table + a probe-bounded pair verify (:func:`_pair_jaccard`);
    round 1 dominates and is the same candidate-generation shuffle
    the pair path pays — minus the quadratic within-bucket explosion.
    Verified edges are localCheckpointed per round (bounded:
    <= residual-band rows), so the shingle cache is released before
    returning instead of riding the returned plan.
    """
    sarr = shingle_arrays(_spread(docs), id_col, text_col, k).cache()
    sets = sarr.select("id", F.array_distinct("sarr").alias("ss"))
    cur = minhash_band_table(sarr, n_bands, rows_per_band).localCheckpoint()
    rounds = []
    for rnd in range(star_rounds + 1):
        # No per-round emptiness probe (r14, guide §1 job-count): a
        # residue round only starts when the previous round saw a
        # FAILED edge, and every bad pair came from a star edge, so
        # the residue is non-empty by construction — the old
        # `cur.take(1)` could never fire past round 0, and on an
        # empty corpus round 0 just flows empty frames through the
        # same (fast) jobs into the correctly-typed empty result.
        final = rnd == star_rounds
        star_cnt = None
        if final:
            # residue fallback: all remaining within-bucket pairs
            star = None
            cand_rows = (
                cur.alias("x")
                .join(cur.alias("y"), ["b", "h"])
                .filter(F.col("x.id") < F.col("y.id"))
                .select(
                    F.col("x.id").alias("a_id"), F.col("y.id").alias("b_id")
                )
            )
        else:
            # The star checkpoint stays (r13 negative result): its
            # (a_id, b_id) projection is materialized into
            # _pair_jaccard's persisted candidates anyway, so
            # deferring the checkpoint to the residue path looked
            # like a free job saved — but the interleaved sf0.1 A/B
            # (clean 0.10 s canary window) measured the deferred
            # variant 4.6–6.9 s vs 4.6–5.5 s: residue rounds DO occur
            # on real corpora (md5 band buckets mix similarity
            # groups), and each one re-derives roots+star over the
            # residual band table, costing more than the checkpoint.
            roots = cur.groupBy("b", "h").agg(F.min("id").alias("rid"))
            star = (
                cur.join(roots, ["b", "h"])
                .filter(F.col("id") != F.col("rid"))
                .select(
                    "id",
                    "b",
                    "h",
                    F.least("id", "rid").alias("a_id"),
                    F.greatest("id", "rid").alias("b_id"),
                )
                .localCheckpoint()
            )
            cand_rows = star.select("a_id", "b_id")
            # the star is already materialized: its row count is a
            # free UPPER bound on the distinct pair count, so the
            # broadcast verdict needs no persist+limit probe of the
            # pair frame (one whole job per round, and the probe's
            # early-stopped distinct paid the exchange map side
            # anyway). Over-approximation errs toward the merge
            # path — the safe direction (r7 verdict #3).
            star_cnt = star.count()
        pj = _pair_jaccard(
            cand_rows.distinct(),
            sets,
            over=None if star_cnt is None else star_cnt > 2_000_000,
        ).persist()
        rounds.append(
            pj.filter(F.col("jaccard") >= threshold).localCheckpoint()
        )
        if final:
            pj.unpersist()
            break
        bad = pj.filter(F.col("jaccard") < threshold).select("a_id", "b_id")
        # early exit for the common pure-clique case (every star edge
        # verified): the residue semi-join + checkpoint below is the
        # dominant per-round fixed cost, and with no failed edge the
        # residue is PROVABLY empty — pj is already persisted, so the
        # probe is one bounded scan of the verified pair frame
        if not bad.take(1):
            pj.unpersist()
            break
        cur = (
            star.join(bad, ["a_id", "b_id"], "left_semi")
            .select("id", "b", "h")
            .localCheckpoint()
        )
        pj.unpersist()
    sarr.unpersist()
    if not rounds:
        idt = docs.schema[id_col].dataType.simpleString()
        return spark.createDataFrame(
            [], f"a_id {idt}, b_id {idt}, jaccard double"
        )
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    return out.dropDuplicates(["a_id", "b_id"])


def incremental_minhash_pairs(
    docs: DataFrame,
    new_ids,
    id_col="doc_id",
    text_col="text",
    k=3,
    n_bands=4,
    rows_per_band=3,
    threshold=0.5,
) -> DataFrame:
    """Dedup an incoming BATCH against the corpus (and itself) —
    the continuous-ingestion shape of minhash LSH. `new_ids` is a
    Column predicate over the id marking batch membership. Returns
    near-dup pairs (a_id < b_id, jaccard >= threshold) where at
    least one side is new: pairs internal to the old corpus are
    already resolved and never recomputed.

    Scale shape: in production the corpus band table is the
    persisted index (minhash_band_table output, bucketed by (b, h));
    a micro-batch computes signatures for its own docs only and
    equi-joins the index — the batch side is broadcast (hinted
    here), so candidate generation never shuffles the corpus, and
    verification touches only candidate docs' shingle arrays. Cost
    is O(batch + collisions), independent of corpus size.
    """
    sarr = shingle_arrays(_spread(docs), id_col, text_col, k).cache()
    mh = minhash_band_table(sarr, n_bands, rows_per_band).cache()
    mh_new = mh.filter(new_ids(F.col("id")))
    cand = (
        mh.alias("x")
        .join(F.broadcast(mh_new.alias("y")), ["b", "h"])
        .filter(F.col("x.id") != F.col("y.id"))
        .select(
            F.least("x.id", "y.id").alias("a_id"),
            F.greatest("x.id", "y.id").alias("b_id"),
        )
        .distinct()
    )
    sets = sarr.select("id", F.array_distinct("sarr").alias("ss"))
    pj = _pair_jaccard(cand, sets)
    # re-tie: the filter below is a new handle; without this the
    # intermediate dies at return and drops the candidate pin early
    return tie_unpersist(
        pj.filter(F.col("jaccard") >= threshold), pj, sarr, mh
    )


def incremental_minhash_pairs_indexed(
    docs: DataFrame,
    bands: DataFrame,
    new_ids,
    id_col="doc_id",
    text_col="text",
    k=3,
    threshold=0.5,
    broadcast_max_pairs: int = 2_000_000,
) -> DataFrame:
    """incremental_minhash_pairs served from the PERSISTED band index
    (sources/layout.py MINHASH_BANDS_DIRNAME): `bands` is the (id, b,
    h) table covering the corpus including the batch, so no signature
    is computed at query time at all — candidate generation is one
    equi-join of the index against its own (broadcast) batch slice.
    `bands` must have been built at the same (k, n_bands,
    rows_per_band) family; the caller owns that contract (the
    registered query only reads the index at the default family).

    Verification re-shingles ONLY candidate docs: the candidate-id
    set semi-joins the corpus down before any text is tokenized, so
    the per-batch cost is O(batch + collisions) in both compute and
    shuffle — the contract the non-indexed variant documents but can
    only deliver once this index exists. The candidate pair set is
    checkpointed (it feeds the id-prune, the verify join, AND the
    broadcast-bound probe; usually collision-sized by the LSH banding
    argument).

    The candidate-id broadcast uses the same MEASURED bound as
    `_pair_jaccard`, not an unconditional hint (r8 advice): on the
    degenerate clique corpora the 160x stress measured (127M collision
    pairs), the candidate-id set approaches corpus cardinality and a
    forced broadcast has no escape. The probe is O(bound) against the
    already-checkpointed cand; over the bound the prune falls back to
    an unhinted semi-join (AQE sees the checkpoint's real size) and
    `_pair_jaccard` downstream independently bounds its own build."""
    bands_new = bands.filter(new_ids(F.col("id")))
    cand = (
        bands.alias("x")
        .join(F.broadcast(bands_new.alias("y")), ["b", "h"])
        .filter(F.col("x.id") != F.col("y.id"))
        .select(
            F.least("x.id", "y.id").alias("a_id"),
            F.greatest("x.id", "y.id").alias("b_id"),
        )
        .distinct()
        .localCheckpoint()
    )
    over = cand.limit(broadcast_max_pairs + 1).count() > broadcast_max_pairs
    hint = (lambda d: d) if over else F.broadcast
    cand_ids = (
        cand.select(F.col("a_id").alias("cid"))
        .union(cand.select(F.col("b_id").alias("cid")))
        .distinct()
    )
    cdocs = docs.join(
        hint(cand_ids), docs[id_col] == F.col("cid"), "semi"
    )
    sets = shingle_arrays(_spread(cdocs), id_col, text_col, k).select(
        "id", F.array_distinct("sarr").alias("ss")
    )
    # cand is already checkpointed and already counted against the
    # bound above — hand the verdict through so the verify does not
    # persist + probe the same frame again (one whole job per query)
    pj = _pair_jaccard(cand, sets, broadcast_max_pairs, over=over)
    return tie_unpersist(
        pj.filter(F.col("jaccard") >= threshold), pj
    )


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


def embedding_neardup(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: tuple[int, ...] = (1, 17, 33, 49),
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a_id < b_id, sim >= t).

    Scale path: sign-LSH buckets (operators/similarity.sign_bucket)
    make candidate generation an equi self-join on the bucket code —
    never all-pairs — then exact cosine verifies candidates only.
    Like any LSH dedup, pairs whose hyperplane signs differ land in
    different buckets and are unseen (recall grows with band count;
    the ann_lsh_bucket_topk tradeoff, documented not hidden).

    SIZE len(dims) WITH THE CORPUS: within-bucket comparison is
    quadratic in bucket size (expected pairs ~ n^2 / 2^bits), so the
    hyperplane count must grow ~2*log2(n) to keep per-bucket pair
    counts bounded — the same O(sqrt(n))-cells rule documented on
    semantic_dedup's n_lists. The 4-bit default is the
    oracle-checkable toy configuration, not the deployment one.
    """
    from nerd_spark.operators.similarity import pair_sim, sign_bucket, with_norm

    e = with_norm(
        embeddings.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
            sign_bucket(vec_col, dims).alias("bucket"),
        ),
        "v",
        "vnorm",
    )
    pairs = (
        e.alias("x")
        .join(e.alias("y"), "bucket")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("a_id"),
            F.col("y.id").alias("b_id"),
            pair_sim(
                F.col("x.v"), F.col("y.v"), F.col("x.vnorm"), F.col("y.vnorm")
            ).alias("sim"),
        )
    )
    return pairs.filter(F.col("sim") >= threshold)


def simhash_neardup(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-duplicate pairs (a_id < b_id, hamming <= k).

    Candidate generation by banding the 16-bit hash into four 4-bit
    bands: any pair within hamming distance 3 must agree on at least
    one whole band (pigeonhole), so candidates come from an equi
    self-join on (band_idx, band_value) — never all-pairs — and
    bit_count(xor) verifies candidates exactly. The standard
    hamming-LSH construction; recall is total for k < n_bands.
    """
    h = simhash(docs, id_col=id_col, text_col=text_col)
    bands = None
    for bi in range(4):
        b = h.select(
            "id",
            "simhash",
            F.lit(bi).alias("band_idx"),
            F.shiftright("simhash", bi * 4).bitwiseAND(F.lit(15)).alias("band_val"),
        )
        bands = b if bands is None else bands.unionByName(b)
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band_idx", "band_val"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("a_id"),
            F.col("y.id").alias("b_id"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    return cand.select(
        "a_id",
        "b_id",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def span_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    min_df: int = 2,
) -> DataFrame:
    """C4-style cross-document span deduplication: fixed k-token
    blocks that recur in >= min_df DISTINCT documents are boilerplate
    (navigation chrome, license headers, templated text) and are
    removed from every document that carries them.

    Returns (doc_id, n_blocks, n_removed, kept_text) — kept_text is
    the document with boilerplate blocks deleted, blocks in original
    order. Scale shape: map-only blocking (the shingle discipline:
    token split materialized once, _spread for narrow inputs), ONE
    shuffle to count per-block document frequency, and a fingerprint
    join back — never all-pairs, O(corpus tokens / k) block rows.
    Empty documents produce no output row (no blocks), matching the
    SQL oracle's unnest semantics.

    r14 verify restructure (guide §2.3/§3.1): the document-frequency
    side now (a) dedups (doc, fp) MAP-SIDE via array_distinct over the
    per-doc fingerprint array — a plain count over pre-distinct rows
    replaces the count_distinct expand, removing one Exchange of
    (fp, id) rows — and (b) ships ONLY the boilerplate fingerprints
    (block_df >= min_df) into the join build side instead of every
    distinct block's (fp, df) row. Most blocks are unique (df=1), so
    the build side shrinks from ~all-distinct-blocks to just the
    recurring ones — at sf0.1x16 that is what keeps the join a
    broadcast (the full df table was brushing the 64 MB threshold,
    and past it the btext-carrying block rows would shuffle by fp).
    The block rows themselves never shuffle before the final per-doc
    regroup, and boilerplate btext is dropped map-side by the
    collect_list filter before that exchange. Flag equivalence:
    fp IN boiler-set  <=>  block_df >= min_df (interleaved A/B at
    16x: old 4.8-16.1 s vs new 3.9-7.9 s, never slower; exceptAll
    diff 0 both ways).
    """
    base = _spread(docs).select(
        F.col(id_col).alias("id"), tokens(text_col).alias("toks")
    )
    nblocks = F.ceil(F.size("toks") / F.lit(k)).cast("int")
    # guard: sequence(0, -1) counts DOWN under ANSI — empty docs get
    # an empty block array instead
    idxs = F.when(nblocks > 0, F.sequence(F.lit(0), nblocks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    blocks = base.select(
        "id",
        F.explode(
            F.transform(
                idxs,
                lambda i: F.struct(
                    i.alias("bi"),
                    F.concat_ws(" ", F.slice("toks", i * k + 1, k)).alias("btext"),
                ),
            )
        ).alias("b"),
    ).select("id", "b.bi", "b.btext", F.md5("b.btext").alias("fp"))
    docfp = base.select(
        F.explode(
            F.array_distinct(
                F.transform(
                    idxs,
                    lambda i: F.md5(
                        F.concat_ws(" ", F.slice("toks", i * k + 1, k))
                    ),
                )
            )
        ).alias("fp")
    )
    boiler_fps = (
        docfp.groupBy("fp")
        .agg(F.count("*").alias("block_df"))
        .filter(F.col("block_df") >= min_df)
        .select("fp", F.lit(True).alias("boiler0"))
    )
    flagged = blocks.join(boiler_fps, "fp", "left").withColumn(
        "boiler", F.coalesce("boiler0", F.lit(False))
    )
    kept = F.array_sort(
        F.collect_list(
            F.when(~F.col("boiler"), F.struct("bi", "btext"))
        )
    )
    return (
        flagged.groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.count("*").cast("long").alias("n_blocks"),
            F.sum(F.col("boiler").cast("long")).alias("n_removed"),
            F.concat_ws(
                " ", F.transform(kept, lambda s: s["btext"])
            ).alias("kept_text"),
        )
    )
