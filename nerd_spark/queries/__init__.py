"""Query inventory: the driver-facing contract.

Each query is registered with a Spark implementation and (where
SQL-expressible) a DuckDB oracle. `__spark_entry__.py` re-exports
REGISTRY/ORACLE. Families per SURVEY.md §2:

- relational: scans (S), filters/predicates (P), joins (J),
  windows/sort/top-k (W), scalar functions
- analytics: the NERD-model aggregations (A) — daily rollups,
  windowed totals, EWMA, type profiles, reputation, summaries
- dataprep: training-data operators — dedup (exact/minhash/simhash/
  jaccard), similarity search, text analysis, multimodal plumbing
- streamingq: Structured Streaming paths (rows-only checks)
"""

from nerd_spark.queries.base import ORACLE, REGISTRY

# Importing the family modules populates the registry. ORDER MATTERS:
# the driver's per-round correctness snapshot covers the FIRST 50
# registered queries, so the families go in priority order — §2
# relational core (S/P/J/W) first, then the read-path/ML/tags surface,
# reputation multi-source, and the typed record pipeline; the
# analytics A-family and the dataprep long tail follow (they were
# driver-green in rounds 1–2 and rotate out of the window this round).
from nerd_spark.queries import relational  # noqa: E402,F401
from nerd_spark.queries import reputationq  # noqa: E402,F401
from nerd_spark.queries import surface  # noqa: E402,F401
from nerd_spark.queries import recordq  # noqa: E402,F401
from nerd_spark.queries import analytics  # noqa: E402,F401
from nerd_spark.queries import dataprep  # noqa: E402,F401
from nerd_spark.queries import streamingq  # noqa: E402,F401

# The inventory exceeds the driver's 50-entry correctness window, so
# the window front is hand-prioritized each round.
# Round-13 rotation (implements the r12 verdict's binding schedule):
# 1. the 38 r10-latest rows at the staleness bound MUST head the
#    window (computed from the CORRECTNESS_r01-r12 union; the r12
#    verdict's prose list overcounted by two -- a1_daily_rollup and
#    sessionize_stats are r11-latest);
# 2. queries ADDED this round, registered INSIDE the window:
#    cohort_retention_served + hh_users_served + a1_daily_served +
#    a2_window_served + op_merge_served + w1_topk_served (the
#    serve-tier certification recipe extended to EVERY remaining fold
#    algebra — cohort, keycount, daily, window, merged-snapshot,
#    top-k — so all eight ingest-fold algebras are now under the
#    driver's hash gate, r12 verdict #2 completed beyond its ask) and
#    hh_users_min_count + hh_by_type_min_count (the scale-stable
#    absolute-count heavy-key bindings, r12 verdict #5);
# 3. queries whose DRIVER-EXERCISED code paths changed this round
#    (the driver runs on raw sf0.01 dirs, so only raw paths and
#    in-body folds count): funnel_stages_served + quantile_values_served
#    (the staged-commit protocol gained the atomic manifest write and
#    the unparseable-manifest discard; quantile_values_served also
#    rides the new window-free quantiles_from_counts shape),
#    top_frequent_users (bounded rank now via sort_array+posexplode
#    instead of the unpartitioned window). The IVF centroid renumber
#    (same shape) is covered by ann_ivf_topk/_indexed inside the
#    r10-38 block;
# 4. fill to 50 with the oldest (r11-latest) remaining rows.
# After r13: no row older than r11 except the r11 remainder, which
# completes in r14 (the staleness obligation the r12 verdict set).
_WINDOW_PRIORITY = [
    # 1 -- r10-latest (staleness bound; binding, r12 verdict #1)
    "a7_total_multi",
    "ann_cosine_topk",
    "ann_ivf_indexed",
    "ann_ivf_topk",
    "ann_lsh_bucket_topk",
    "contamination_check",
    "dedup_clusters",
    "dedup_clusters_scalable",
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "emb_centroids",
    "fmp_training_frame",
    "hh_terms",
    "ip_records",
    "j4_range_join_bucketed",
    "leakage_safe_split",
    "lm_unigram_logprob",
    "mixture_sample",
    "p11_threat_categorization",
    "p12_dnsbl_membership",
    "p13_geo_enrichment",
    "p14_ptr_hostname",
    "quality_model_filter",
    "read_path_search",
    "read_path_typed",
    "s4_misp_upserts",
    "s8_event_fetch",
    "sequence_packing",
    "set_ops_union",
    "text_fingerprint",
    "text_langid",
    "text_pii_scrub",
    "text_quality",
    "text_repetition",
    "tfidf_top_terms",
    "train_val_split",
    "w6_rank_lag",
    # 2 -- NEW this round (r12 verdict #2 completed, and #5)
    "cohort_retention_served",
    "hh_users_served",
    "a1_daily_served",
    "a2_window_served",
    "op_merge_served",
    "w1_topk_served",
    "hh_users_min_count",
    "hh_by_type_min_count",
    # 3 -- driver-exercised code path changed this round (r13)
    "funnel_stages_served",
    "quantile_values_served",
    "top_frequent_users",
    # 4 -- oldest (r11-latest) fill to 50
    "a1_daily_rollup",
]


def _order_for_window() -> None:
    missing = [n for n in _WINDOW_PRIORITY if n not in REGISTRY]
    if missing:
        raise KeyError(f"window-priority queries not registered: {missing}")
    rest = [n for n in REGISTRY if n not in _WINDOW_PRIORITY]
    ordered = _WINDOW_PRIORITY + rest
    for reg in (REGISTRY, ORACLE):
        snap = dict(reg)
        reg.clear()
        reg.update((n, snap[n]) for n in ordered if n in snap)


_order_for_window()

__all__ = ["REGISTRY", "ORACLE"]
