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

# The inventory (120) exceeds the driver's 50-entry correctness
# window, so the window front is hand-prioritized each round.
# Round-8 rotation:
# 1. the five r5-latest queries the r7 trim scheduled first (the
#    ≤2-round staleness invariant is now binding on them);
# 2. queries NEW this round — the p15–p20 enrichment stages
#    (CAIDA AS-class, reserved-IP tagging, ASN rank, CIRCL BGP rank,
#    Shodan InternetDB, Passive-DNS domain blacklists);
# 3. the six formerly rows-only queries that now carry self-oracle
#    goldens (queries/golden.py) — their oracle status changed, so
#    the driver must re-record them as hash rows: the trained ANN
#    family (ivf_trained/pq/ivfpq), the GBT scorer, the free-T
#    mixture, and the HLL a2 variant;
# 4. the r6-latest remainder (everything green in r6 but outside the
#    r7 window), trimmed by 11 to fit: the trims all have an
#    unchanged code path this round AND a fresher sibling on the same
#    module (curation v2/v3 compose in-window stage queries;
#    best_of_cluster/minhash_lsh/semantic/span share operators/
#    dedup.py+components.py with dedup_exact/clusters, r7-green;
#    mixture_temperature shares temperature_mixture with the
#    in-window free-T variant; quality_gopher_rules shares
#    ml/quality.py with quality_model_filter, in; shard_assign shares
#    operators/sampling.py with train_val_split r7-green;
#    f_ip_codec's functions/ip path underlies in-window p16 and
#    r7-green p12/p14; op_array_upsert_rebuild shares
#    operators/merge.py with op_merge_snapshot r7-green). They sit at
#    the staleness bound and rotate FIRST into r9.
_WINDOW_PRIORITY = [
    # 1 — r5-latest (staleness bound)
    "a6_rep_blacklists",
    "a6_rep_dshield",
    "dedup_simhash_pairs",
    "fmp_training_frame",
    "j4_range_join_bucketed",
    # 2 — new this round
    "p15_as_class",
    "p16_reserved_ip",
    "p17_asn_rank",
    "p18_bgp_rank",
    "p19_shodan",
    "p20_passive_dns",
    "weighted_sample_topk",
    "hh_event_users",
    "hh_terms",
    "quantile_event_values",
    "quantile_by_event_type",
    "streaming_hh_terms",
    "corpus_stats_card",
    "hh_by_event_type",
    "lm_bigram_logprob",
    "top_frequent_users",
    # 3 — rows-only -> self-oracle golden (changed oracle status)
    "ann_ivf_trained",
    "ann_pq_topk",
    "ann_ivfpq_indexed",
    "fmp_score_gbt",
    "mixture_temperature_free",
    "a2_window_totals_approx",
    # 4 — r6-latest remainder (three more trims to fit the late-round
    #    p18/p19/p20 additions, same fresher-sibling rule:
    #    a2_window_totals serves from the same layout window table as
    #    in-window a2_window_totals_approx; j4_range_join shares
    #    operators/rangejoin.py with in-window j4_range_join_bucketed
    #    and j5; j9_semi_anti shares the relational join family with
    #    in-window j6/j8; p7_json_exists shares the relational
    #    predicate family with in-window p5/p6. Two further trims for
    #    the new hh_event_users/hh_terms: s5_point_read and
    #    s6_filtered_find, whose relational read path is covered
    #    in-window by read_path_search/read_path_typed/s8; and for the
    #    quantile pair, w5_pivot (window family covered in-window by
    #    w1_topk/w4_last_n_per_key) and, for
    #    streaming_hh_terms, p3_list_or_range and p4_suffix_predicate
    #    (predicate family covered in-window by p2/p5/p6; p4's
    #    plans/filters.py path also under in-window read_path_search);
    #    and for corpus_stats_card and
    #    hh_by_event_type, a13_intervals and a11_distinct_pair_counts
    #    (analytics family; sessionize_stats + the A rollups cover
    #    queries/analytics.py in-window); and for lm_bigram_logprob,
    #    nru_due_selection (r6-latest; its streaming/nru path is also
    #    under the r7-green streaming_daily_counts + 7 pytest suites);
    #    and for top_frequent_users, s10_export_blocklist (r6-latest;
    #    sources/exports.py is also pytest-covered end to end). All rotate
    #    FIRST into r9.)
    "ann_ivf_indexed",
    "ip_records",
    "j1_equi_join",
    "j2_enrichment_chain",
    "j5_asof_join",
    "j6_bulk_lookup",
    "j8_group_stats_join_back",
    "p10_validity_filter",
    "p11_threat_categorization",
    "p1_projection",
    "p2_range_predicate",
    "p5_multi_value_and_or",
    "p6_elem_match",
    "p8_semijoin",
    "p9_warden_filter_dsl",
    "quality_model_filter",
    "read_path_search",
    "read_path_typed",
    "s4_misp_upserts",
    "s8_event_fetch",
    "sessionize_stats",
    "w1_topk",
    "w4_last_n_per_key",
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
