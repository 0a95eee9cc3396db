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

# The inventory (128) exceeds the driver's 50-entry correctness
# window, so the window front is hand-prioritized each round.
# Round-10 rotation (implements the r9 verdict's binding schedule):
# 1. the 30 r7-latest queries MUST head the window — after r10 no
#    query's latest driver row may be older than r8 (the ≤2-round
#    staleness invariant);
# 2. NEW this round: dedup_clusters_scalable (star-edge candidate
#    generation feeding the same connected-components resolution —
#    shares the pair-path oracle, so a hash match proves cluster
#    equivalence);
# 3. code path changed this round: op_merge_snapshot (ingest-
#    maintained merged-snapshot serve with freshness gate + raw
#    fallback, oracle stays on raw) and the sketches family's
#    broadcast-escape + layout-stats probe rewiring — hh_by_event_type,
#    hh_event_users, hh_terms are r8-latest AND changed, so they head
#    the r8 fill; the r9-latest changed siblings (top_frequent_users,
#    quantile_*) stay out-of-window this round but are pinned by the
#    sf0.01 pytest oracle mirror and rotate first into r11 with the
#    rest of the r9 cohort's dependents;
# 4. r8-latest fill (18 of 43): the changed sketches trio, the
#    headline bench queries (j1/j5/w1/w4/j4_bucketed/ann_ivf_indexed),
#    the typed-record + read-path surface (ip_records,
#    read_path_typed/search), ML training frame, the intel/event
#    sources (s4/s8), and the DSL compilers (p9/p11) +
#    quality_model_filter. The remaining 25 r8-latest
#    (a2_window_totals_approx, a6_rep_blacklists, a6_rep_dshield,
#    ann_ivf_trained, ann_ivfpq_indexed, ann_pq_topk,
#    dedup_simhash_pairs, fmp_score_gbt, j2_enrichment_chain,
#    j6_bulk_lookup, j8_group_stats_join_back, mixture_temperature_free,
#    p10_validity_filter, p15_as_class, p16_reserved_ip, p17_asn_rank,
#    p18_bgp_rank, p19_shodan, p1_projection, p2_range_predicate,
#    p5_multi_value_and_or, p6_elem_match, p8_semijoin,
#    sessionize_stats, weighted_sample_topk) sit at the staleness
#    bound after r10 and rotate FIRST into r11, together with the
#    queries ADDED mid-round-10 after the window was set
#    (funnel_stages, cohort_retention, dedup_containment,
#    streaming_cohort — oracled
#    and pytest-mirrored at sf0.001/sf0.01 this round, registered
#    past the window so the mandated r7/r8 refresh is undisturbed).
_WINDOW_PRIORITY = [
    # 1 — r7-latest (staleness bound; mandated by the r9 verdict)
    "a5_type_profile",
    "a7_total_multi",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_lsh_bucket_topk",
    "contamination_check",
    "corpus_curation",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "emb_centroids",
    "leakage_safe_split",
    "lm_unigram_logprob",
    "mixture_sample",
    "multimodal_bytes",
    "p12_dnsbl_membership",
    "p13_geo_enrichment",
    "p14_ptr_hostname",
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
    # 2 — new this round
    "dedup_clusters_scalable",
    # 3 — code path changed this round (r9-latest)
    "op_merge_snapshot",
    # 4 — r8-latest fill (18; changed sketches trio first)
    "hh_by_event_type",
    "hh_event_users",
    "hh_terms",
    "j1_equi_join",
    "j5_asof_join",
    "w1_topk",
    "w4_last_n_per_key",
    "j4_range_join_bucketed",
    "ann_ivf_indexed",
    "quality_model_filter",
    "fmp_training_frame",
    "ip_records",
    "read_path_typed",
    "read_path_search",
    "s4_misp_upserts",
    "s8_event_fetch",
    "p9_warden_filter_dsl",
    "p11_threat_categorization",
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
