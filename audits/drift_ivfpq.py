#!/usr/bin/env python
"""De-confounded IVF-PQ recall-drift measurement (r8 verdict #6).

The r8 drift table (recall@10 0.82 at +11% appends, 0.68 at +33%,
0.62 at +100%) trained quantizers on the FULL base corpus of each
split, so a smaller base meant a smaller training set — a confound
the round recorded honestly. This audit removes it by training both
quantizer levels (coarse centroids + PQ codebooks) on a FIXED-SIZE,
FIXED-CONTENT sample (faiss's bounded training-set discipline), which
also exposes the structural fact the confound was hiding:

  ivfpq_append is tested bit-equal to building the full index under
  the same frozen quantizers, so with fixed-sample quantizers an
  IDENTICALLY-DISTRIBUTED append stream produces an index state
  independent of where the base/append split falls. Pure iid append
  drift is exactly ZERO — by construction, not measurement.

What CAN drift is the match between the training sample and the data
distribution: appends from a SHIFTED distribution are quantized by
centroids/codebooks that never saw their region. This audit measures
that real signal: appended vectors are deterministically
dimension-reversed (norm-preserving, genuinely different subspace),
recall@10 is evaluated over queries drawn from the shifted appends
(the neighborhoods a frozen quantizer serves worst), against
(a) the frozen-quantizer append index and (b) a retrain oracle whose
fixed-size sample covers the mixed corpus.

Usage: python audits/drift_ivfpq.py [sf_dir]   (default sf0.1)
Prints one JSON line; the table lands in PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nerd_spark.operators import pq as PQ  # noqa: E402
from nerd_spark.operators import similarity as SIM  # noqa: E402
from nerd_spark.session import get_spark, read_table  # noqa: E402

N_LISTS, N_PROBE, RERANK, K = 16, 4, 100, 10
TRAIN_N = 400  # fixed quantizer training-set size, every variant


def _recall(spark, path, emb, query_pred) -> float:
    queries = emb.filter(query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    approx = PQ.ivfpq_probe(
        spark, path, queries, k=K, n_probe=N_PROBE, rerank=RERANK
    )
    exact = SIM.brute_force_topk(emb, query_pred, k=K)
    return round(SIM.recall_at_k(approx, exact), 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="drift_audit")
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    base_dir = tempfile.mkdtemp(prefix="nerd_drift_")

    # the shifted universe: ids offset past the corpus, vectors
    # dimension-reversed (norm-preserving distribution shift)
    shifted_all = emb.select(
        (F.col("vec_id") + F.lit(n)).alias("vec_id"),
        F.reverse(F.col("embedding")).alias("embedding"),
    )

    # fixed-sample quantizers, trained ONCE on the first TRAIN_N base
    # ids — identical across every split below
    train_slice = emb.filter(F.col("vec_id") < TRAIN_N)
    books = PQ.train_pq_codebooks(train_slice, train_rows=TRAIN_N)
    cents = SIM.kmeans_centroids(train_slice, N_LISTS)

    # intrinsic baseline: the fixed-quantizer index on the unshifted
    # corpus, base queries — what recall these index params buy BEFORE
    # any append enters (drift must be read relative to this, not 1.0)
    ipath = os.path.join(base_dir, "idx_intrinsic")
    PQ.build_ivfpq_index(
        emb, ipath, n_lists=N_LISTS, codebooks=books, centroids=cents
    )
    intrinsic = _recall(spark, ipath, emb, F.col("vec_id") < 40)

    out = {"n_base": n, "train_n": TRAIN_N, "intrinsic": intrinsic, "iid_drift": "0 by construction "
           "(append bit-equal to full build under frozen quantizers; "
           "fixed-sample training makes the quantizer split-invariant)"}

    for frac_label, n_app in (("+11%", n // 9), ("+33%", n // 3), ("+100%", n)):
        appends = shifted_all.filter(F.col("vec_id") < n + n_app)
        mixed = emb.unionByName(appends)
        q_pred = (F.col("vec_id") >= n) & (F.col("vec_id") < n + 40)

        # frozen path: build on base with the fixed quantizers, append
        path = os.path.join(base_dir, f"idx_{n_app}")
        PQ.build_ivfpq_index(
            emb, path, n_lists=N_LISTS, codebooks=books, centroids=cents
        )
        PQ.ivfpq_append(spark, path, appends)
        frozen = _recall(spark, path, mixed, q_pred)
        frozen_base_q = _recall(spark, path, mixed, F.col("vec_id") < 40)

        # retrain oracle: same SIZE sample, drawn across the mixed
        # corpus (every other row by id parity covers both regions)
        r_slice = mixed.filter(
            F.pmod(F.col("vec_id"), F.lit(max(1, (n + n_app) // TRAIN_N)))
            == 0
        )
        r_books = PQ.train_pq_codebooks(r_slice, train_rows=TRAIN_N)
        r_cents = SIM.kmeans_centroids(r_slice, N_LISTS)
        rpath = os.path.join(base_dir, f"idx_rt_{n_app}")
        PQ.build_ivfpq_index(
            mixed, rpath, n_lists=N_LISTS, codebooks=r_books, centroids=r_cents
        )
        retrained = _recall(spark, rpath, mixed, q_pred)

        out[frac_label] = {"frozen": frozen, "retrained": retrained,
                           "frozen_base_queries": frozen_base_q,
                           "appended_frac_of_corpus":
                           round(n_app / (n + n_app), 3)}

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
