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
# Round-11 rotation (implements the r10 verdict's binding schedule):
# 1. the 4 queries registered mid-round-10 AFTER the r10 window was
#    set — funnel_stages, cohort_retention, dedup_containment,
#    streaming_cohort — have never had a driver CORRECTNESS row and
#    MUST head the window;
# 2. the 25 r8-latest queries sit at the ≤2-round staleness bound and
#    rotate next (the exact list the r10 verdict pinned);
# 3. r9-latest queries whose code paths changed in round 10
#    (top_frequent_users, quantile_event_values, quantile_by_event_type,
#    corpus_stats_card, text_token_stats — the sketches probe-routing +
#    colstats-sidecar rewiring);
# 4. queries whose code paths changed THIS round (round 11):
#    q1_pricing_summary (serve-constant adjudication),
#    corpus_curation_v3 (shared shingle scan), hh_by_event_type /
#    hh_event_users / top_frequent_users (count-table serves),
#    j5_asof_join (user-bucketed exchange-free window), w1_topk
#    (mergeable top-k answer table), PLUS the two
#    queries ADDED this round — corpus_curation_v4 (containment
#    curation stage) and streaming_funnel (watermark-bounded exact) —
#    registered INSIDE the window, not past it (the r10 never-checked
#    gap came from registering past a set window);
# 5. fill to 50 with r9-latest rows (headline + infra-adjacent first).
# After r11: zero never-checked queries; no query's latest driver row
# older than r9. The remaining 33 r9-latest rows rotate in r12.
_WINDOW_PRIORITY = [
    # 1 — never driver-checked (added mid-round-10; binding, r10 verdict)
    "funnel_stages",
    "cohort_retention",
    "dedup_containment",
    "streaming_cohort",
    # 2 — r8-latest (staleness bound; binding, r10 verdict)
    "a2_window_totals_approx",
    "a6_rep_blacklists",
    "a6_rep_dshield",
    "ann_ivf_trained",
    "ann_ivfpq_indexed",
    "ann_pq_topk",
    "dedup_simhash_pairs",
    "fmp_score_gbt",
    "j2_enrichment_chain",
    "j6_bulk_lookup",
    "j8_group_stats_join_back",
    "mixture_temperature_free",
    "p10_validity_filter",
    "p15_as_class",
    "p16_reserved_ip",
    "p17_asn_rank",
    "p18_bgp_rank",
    "p19_shodan",
    "p1_projection",
    "p2_range_predicate",
    "p5_multi_value_and_or",
    "p6_elem_match",
    "p8_semijoin",
    "sessionize_stats",
    "weighted_sample_topk",
    # 3 — r9-latest, code path changed in round 10
    "top_frequent_users",
    "quantile_event_values",
    "quantile_by_event_type",
    "corpus_stats_card",
    "text_token_stats",
    # 4 — code path changes this round (r11)
    "q1_pricing_summary",
    "corpus_curation_v3",
    "corpus_curation_v4",
    "streaming_funnel",
    "hh_by_event_type",
    "hh_event_users",
    "j5_asof_join",
    "w1_topk",
    "w4_last_n_per_key",
    # 5 — r9-latest fill to 50 (headline + infra-adjacent)
    "a1_daily_rollup",
    "a2_window_totals",
    "dedup_minhash_lsh",
    "j4_range_join",
    "op_array_upsert_rebuild",
    "fmp_score",
    "streaming_daily_counts",
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
