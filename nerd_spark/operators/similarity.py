"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — the correctness baseline.
  Query set broadcast against the corpus; dot products via
  zip_with + aggregate (JVM-side higher-order functions, no UDF).
- lsh_bucket_topk: the scale path — deterministic sign-LSH buckets
  (axis-aligned hyperplanes) so candidates co-locate in an equi-join
  bucket; top-k within bucket. At 100 TB the bucket join replaces the
  corpus-size cross join; recall is tuned by bits/probes.

All math in double with sequential folds so an ANSI-SQL oracle
(list_dot_product over DOUBLE[]) produces identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return (F.col(col) if isinstance(col, str) else col).cast("array<double>")


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a):
    return F.sqrt(dot(a, a))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def with_norm(df: DataFrame, vec: str, out: str) -> DataFrame:
    """Bind ||vec|| to a real column in its own select stage, BEFORE
    the pair join.

    Scoring pairs with ``cosine()`` re-folds both norms per PAIR; with
    the norms bound per input row the per-pair work drops from three
    64-element folds to one (measured 3.6 -> 2.3 s on the 320k x 10
    brute-force crossJoin at 160x). Bit-parity with cosine() holds —
    identical sequential folds, and IEEE multiply is commutative — so
    every DuckDB oracle is unchanged. The Project sits under the Join
    node, so Catalyst structurally cannot collapse it into the
    per-pair projection (re-evaluation per consumer is the PLANS.md
    HOF pitfall). An Arrow/numpy kernel alternative was measured
    SLOWER than this form (PLANS.md round-8 cosine-kernel note): the
    vector transfer out of the JVM costs more than the folds.
    """
    return df.select("*", norm(F.col(vec)).alias(out))


def pair_sim(xv, yv, xn, yn):
    """round(cosine, 6) over pre-bound norms (see with_norm)."""
    return F.round(dot(xv, yv) / (xn * yn), 6)


def brute_force_topk(
    embeddings: DataFrame,
    query_pred,
    k: int = 10,
    id_col="vec_id",
    vec_col="embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for rows matching query_pred.

    Returns (query_id, neighbor_id, sim). Self-matches excluded; ties
    broken by neighbor id. The query side is broadcast, so the corpus
    scan stays partition-parallel with no shuffle until the final
    per-query top-k (TakeOrdered per partition via window).
    """
    q = with_norm(
        embeddings.filter(query_pred).select(
            F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
        ),
        "qv",
        "qnorm",
    )
    c = with_norm(
        embeddings.select(
            F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
        ),
        "cv",
        "cnorm",
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            pair_sim(F.col("qv"), F.col("cv"), F.col("qnorm"), F.col("cnorm")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def sign_bucket(vec_col, dims: tuple[int, ...] = (1, 17, 33, 49)):
    """Deterministic sign-LSH bucket code: bit i set when element at
    1-based index dims[i] is >= 0 (axis-aligned hyperplanes)."""
    v = _as_double(vec_col)
    code = F.lit(0)
    for i, d in enumerate(dims):
        code = code + F.when(F.element_at(v, d) >= 0, F.lit(2**i)).otherwise(F.lit(0))
    return code


def lsh_bucket_topk(
    embeddings: DataFrame,
    query_pred,
    k: int = 5,
    id_col="vec_id",
    vec_col="embedding",
    dims: tuple[int, ...] = (1, 17, 33, 49),
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, then exact cosine within the bucket. The cross join of
    brute force becomes an equi-join on the bucket code."""
    withb = with_norm(
        embeddings.select(
            F.col(id_col).alias("id"),
            _as_double(vec_col).alias("v"),
            sign_bucket(vec_col, dims).alias("bucket"),
        ),
        "v",
        "vnorm",
    )
    q = withb.filter(query_pred(F.col("id"))).select(
        F.col("id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("vnorm").alias("qnorm"),
        "bucket",
    )
    sims = (
        withb.join(F.broadcast(q), "bucket")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            pair_sim(F.col("qv"), F.col("v"), F.col("qnorm"), F.col("vnorm")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def kmeans_centroids(
    embeddings: DataFrame,
    n_lists: int = 8,
    n_iter: int = 5,
    id_col="vec_id",
    vec_col="embedding",
) -> list[list[float]]:
    """Deterministic spherical-k-means coarse quantizer training.

    Init = first n_lists corpus vectors by id (deterministic, no RNG);
    each Lloyd iteration assigns every vector to its nearest centroid
    by cosine (the same metric the IVF search uses) and recomputes
    centroids as per-dimension means via posexplode + groupBy — fully
    distributed; only the (n_lists × dim) centroid table ever reaches
    the driver, broadcast back each round. Empty clusters keep their
    previous centroid.
    """
    spark = embeddings.sparkSession
    e = embeddings.select(
        F.col(id_col).alias("id"), _as_double(vec_col).alias("v")
    )
    cents = [
        list(r.v)
        for r in e.orderBy("id").limit(n_lists).collect()
    ]
    # corpora smaller than n_lists yield a short init list; clamp so
    # the empty-cluster fallback cents[i] below stays in range instead
    # of raising IndexError mid-Lloyd-loop (ADVICE r02)
    n_lists = min(n_lists, len(cents))
    if n_lists == 0:
        return []
    en = with_norm(e, "v", "vnorm")
    for _ in range(n_iter):
        cdf = with_norm(
            spark.createDataFrame(
                [(i, c) for i, c in enumerate(cents)], "cid int, cv array<double>"
            ),
            "cv",
            "cnorm",
        )
        scored = en.crossJoin(F.broadcast(cdf)).select(
            "id",
            "v",
            "cid",
            (dot(F.col("v"), F.col("cv")) / (F.col("vnorm") * F.col("cnorm"))).alias("csim"),
        )
        w = Window.partitionBy("id").orderBy(F.col("csim").desc(), F.col("cid"))
        assigned = scored.withColumn("crank", F.row_number().over(w)).filter(
            F.col("crank") == 1
        )
        means = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
            .collect()
        )
        new = dict((r.cid, list(r.cv)) for r in means)
        cents = [new.get(i, cents[i]) for i in range(n_lists)]
    return cents


def _default_centroids(e, n_lists: int):
    """Deterministic no-training coarse quantizer: the n_lists corpus
    vectors with the SMALLEST ids, numbered 0..n_lists-1 in id order.
    For dense 0-based id domains this is bit-identical to the old
    ``id < n_lists`` filter (so the IVF oracles are unchanged), but it
    also provisions the full list count on sparse or offset id
    domains, where the filter silently yielded fewer — possibly zero —
    lists (ADVICE r7)."""
    # numbered without a WindowExec (sketches._rank_bounded shape):
    # sort_array over the post-limit(n_lists) rows, list id = array
    # position — no "No Partition Defined" warning in layout logs,
    # one node less than the former unpartitioned row_number window
    st = F.struct(F.col("id").alias("_id"), F.col("v").alias("_v"))
    return (
        e.orderBy("id")
        .limit(n_lists)
        .agg(F.sort_array(F.collect_list(st)).alias("_a"))
        .select(F.posexplode("_a").alias("_pos", "_r"))
        .select(
            F.col("_pos").cast("long").alias("cid"),
            F.col("_r._v").alias("cv"),
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    query_pred,
    k: int = 5,
    n_lists: int = 8,
    n_probe: int = 2,
    id_col="vec_id",
    vec_col="embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: a coarse quantizer partitions the
    corpus into inverted lists; queries scan only their n_probe
    nearest lists.

    Default coarse centroids are the first n_lists corpus vectors —
    deterministic with no training pass, which keeps the structure
    oracle-checkable; pass ``centroids`` (e.g. from
    :func:`kmeans_centroids`) for recall. At scale the corpus is
    stored bucketed by list id, so a query touches n_probe/n_lists of
    the data with no shuffle of the corpus.
    """
    e = embeddings.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    if centroids is not None:
        cents = embeddings.sparkSession.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)],
            "cid long, cv array<double>",
        )
    else:
        cents = _default_centroids(e, n_lists)
    # assign every vector to its nearest centroid (rank 1), queries to
    # their n_probe nearest lists; norms bound per row/per centroid so
    # the assignment crossJoin folds once per row, not per cell
    scored = (
        with_norm(e, "v", "vnorm")
        .crossJoin(F.broadcast(with_norm(cents, "cv", "cnorm")))
        .select(
            "id",
            "v",
            "vnorm",
            "cid",
            F.round(
                dot(F.col("v"), F.col("cv")) / (F.col("vnorm") * F.col("cnorm")), 6
            ).alias("csim"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("csim").desc(), F.col("cid"))
    ranked = scored.withColumn("crank", F.row_number().over(w))
    corpus = ranked.filter(F.col("crank") == 1).select("id", "v", "vnorm", "cid")
    probes = (
        ranked.filter(F.col("crank") <= n_probe)
        .filter(query_pred(F.col("id")))
        .select(
            F.col("id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("vnorm").alias("qnorm"),
            "cid",
        )
    )
    sims = (
        corpus.join(F.broadcast(probes), "cid")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            pair_sim(F.col("qv"), F.col("v"), F.col("qnorm"), F.col("vnorm")).alias("sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("sim").alias("sim"))  # dedup: neighbor seen via 2 lists
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def build_ivf_index(
    embeddings: DataFrame,
    path: str,
    n_lists: int = 8,
    id_col="vec_id",
    vec_col="embedding",
    centroids: list[list[float]] | None = None,
) -> None:
    """Persist the corpus as an on-disk IVF index: every vector
    assigned to its nearest coarse-centroid list (same assignment rule
    as :func:`ivf_topk`), written partitioned by list id — one
    ``cid=<n>/`` directory per inverted list. A probe then reads only
    its n_probe lists via partition pruning (no corpus shuffle, no
    full scan); at 100 TB each list is many files and the pruning
    ratio n_probe/n_lists is the scan-cost ratio.

    The centroid table is written beside the index (``<path>.centroids``)
    so probes don't need the training corpus. ``vnorm`` (the vector's
    L2 norm) is stored per row: norms are a pure function of the
    vector, so computing them at build time follows the same ingest
    discipline as the index itself — a probe's per-candidate work
    drops to the single dot-product fold (older indexes without the
    column are still served; ivf_probe re-folds the norm in-plan).
    """
    spark = embeddings.sparkSession
    e = embeddings.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    if centroids is not None:
        n_lists = len(centroids)
        cents = spark.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)], "cid long, cv array<double>"
        )
    else:
        cents = _default_centroids(e, n_lists)
    scored = (
        with_norm(e, "v", "vnorm")
        .crossJoin(F.broadcast(with_norm(cents, "cv", "cnorm")))
        .select(
            "id",
            "v",
            "vnorm",
            "cid",
            F.round(
                dot(F.col("v"), F.col("cv")) / (F.col("vnorm") * F.col("cnorm")), 6
            ).alias("csim"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("csim").desc(), F.col("cid"))
    corpus = (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") == 1)
        .select("id", "v", "vnorm", "cid")
    )
    # cluster the write by list id: without this every upstream task
    # writes a sliver into every cid dir (tasks x lists tiny files);
    # with it each list is one file per holding task. At real scale
    # the key would be (cid, file_group) to hold files at ~128 MB.
    corpus = corpus.repartition(n_lists, F.col("cid"))
    corpus.write.mode("overwrite").partitionBy("cid").parquet(path)
    cents.write.mode("overwrite").parquet(path + ".centroids")


def ivf_probe(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    collect_probes: bool = False,
) -> DataFrame:
    """Search an on-disk IVF index built by :func:`build_ivf_index`.

    ``queries`` is (query_id, qv array<double>). Each query ranks the
    (tiny, broadcast) centroid table and probes its n_probe nearest
    lists. The probed list ids are collected to the driver — bounded
    by n_lists, not by corpus or query size — so the corpus scan
    carries a LITERAL ``cid IN (...)`` partition filter Spark prunes
    at file-listing time: only n_probe/n_lists of the index is read,
    and the only exchange in the plan is the broadcast of the probe
    side (plan-asserted in tests).

    ``collect_probes`` (r14, guide §1 job-count): when the CALLER
    knows ``queries`` is driver-small (the registered query's
    10-probe shape; anything already bounded by a literal filter),
    the scored probe rows themselves — not just their cids — are
    collected in ONE action, the broadcast side is rebuilt from the
    local rows, and the pruning literals come from the same collect:
    the separate probe-materialize+collect job (and its cache)
    disappears, leaving a single Spark job per search. Off by
    default because the collect is bounded by |queries| x n_probe —
    only the caller can know that bound is driver-safe; the default
    path stays bounded by n_lists regardless of query count.

    Result shape matches :func:`ivf_topk` exactly (same rounding and
    tie-breaks), so the two are interchangeable and share an oracle.
    """
    cents = spark.read.parquet(path + ".centroids")  # n_lists rows
    q = with_norm(queries.select("query_id", _as_double("qv").alias("qv")), "qv", "qnorm")
    qscored = q.crossJoin(F.broadcast(with_norm(cents, "cv", "cnorm"))).select(
        "query_id",
        "qv",
        "qnorm",
        "cid",
        F.round(
            dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm")), 6
        ).alias("csim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("csim").desc(), F.col("cid"))
    probes = (
        qscored.withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= n_probe)
        .select("query_id", "qv", "qnorm", "cid")
    )
    pins = []
    if collect_probes:
        schema = probes.schema
        rows = probes.collect()  # caller-asserted driver-small
        probe_cids = sorted({r.cid for r in rows})
        probes = spark.createDataFrame(rows, schema)
    else:
        probes = probes.cache()  # consumed twice: cid collect + corpus join
        pins = [probes]
        probe_cids = sorted(
            r.cid for r in probes.select("cid").distinct().collect()
        )  # ≤ n_lists values — the literal the partition pruner needs
    corpus = (
        spark.read.parquet(path)
        .filter(F.col("cid").isin(probe_cids))
        .withColumn("cid", F.col("cid").cast("long"))
    )
    if "vnorm" not in corpus.columns:  # pre-r8 index: norm not stored
        corpus = with_norm(corpus, "v", "vnorm")
    sims = (
        corpus.join(F.broadcast(probes), "cid")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            pair_sim(F.col("qv"), F.col("v"), F.col("qnorm"), F.col("vnorm")).alias("sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("sim").alias("sim"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    from nerd_spark.operators.cacheutil import tie_unpersist

    return tie_unpersist(
        sims.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank"),
        *pins,
    )


def recall_at_k(approx: DataFrame, exact: DataFrame) -> float:
    """Mean per-query recall of `approx` against the exact top-k
    (both in (query_id, neighbor_id, ...) shape)."""
    a = approx.select("query_id", "neighbor_id")
    e = exact.select("query_id", "neighbor_id")
    hit = a.join(e, ["query_id", "neighbor_id"], "left_semi").groupBy(
        "query_id"
    ).count().withColumnRenamed("count", "hits")
    tot = e.groupBy("query_id").count().withColumnRenamed("count", "total")
    per_q = tot.join(hit, "query_id", "left").select(
        (F.coalesce("hits", F.lit(0)) / F.col("total")).alias("r")
    )
    row = per_q.agg(F.avg("r").alias("recall")).collect()[0]
    return float(row.recall)


def semantic_dedup(
    embeddings: DataFrame,
    n_lists: int = 8,
    threshold: float = 0.4,
    id_col="vec_id",
    vec_col="embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication: cluster the corpus with
    the coarse quantizer (nearest-centroid assignment, same rule as
    the IVF family), then find near-duplicate pairs ONLY within each
    cluster by exact cosine — the cluster-then-compare discipline that
    replaces an all-pairs cosine join with per-cluster joins (SemDeDup,
    Abbas et al. 2023; the embedding analogue of LSH banding).

    Returns (a_id, b_id, cid, sim) with a_id < b_id, sim >= threshold.
    Scale shape: one broadcast of the (n_lists x dim) centroid table,
    one shuffle on cid for the self-join; a corpus stored bucketed by
    cid (build_ivf_index) makes the join exchange-free. Deterministic
    first-N centroids keep it oracle-checkable; pass kmeans_centroids
    output for recall-grade clustering (rows-only check, like
    ann_ivf_trained).

    SIZE n_lists WITH THE CORPUS: within-cluster comparison is
    quadratic in cluster size, so n_lists must grow ~O(sqrt(n))
    (SemDeDup uses tens of thousands of clusters at web scale) to
    keep per-cluster pair counts bounded — the 8-list default is the
    oracle-checkable toy configuration, not the deployment one.
    """
    e = embeddings.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    if centroids is not None:
        cents = embeddings.sparkSession.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)],
            "cid long, cv array<double>",
        )
    else:
        cents = _default_centroids(e, n_lists)
    scored = (
        with_norm(e, "v", "vnorm")
        .crossJoin(F.broadcast(with_norm(cents, "cv", "cnorm")))
        .select(
            "id",
            "v",
            "vnorm",
            "cid",
            F.round(
                dot(F.col("v"), F.col("cv")) / (F.col("vnorm") * F.col("cnorm")), 6
            ).alias("csim"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("csim").desc(), F.col("cid"))
    assigned = (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") == 1)
        .select("id", "v", "vnorm", "cid")
    )
    pairs = (
        assigned.alias("x")
        .join(assigned.alias("y"), "cid")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("a_id"),
            F.col("y.id").alias("b_id"),
            "cid",
            pair_sim(
                F.col("x.v"), F.col("y.v"), F.col("x.vnorm"), F.col("y.vnorm")
            ).alias("sim"),
        )
    )
    return pairs.filter(F.col("sim") >= threshold)
