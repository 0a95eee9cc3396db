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
# Round-12 rotation (implements the r11 verdict's binding schedule):
# 1. the 35 r9-latest rows at the staleness bound MUST head the window
#    (the r11 verdict corrected the earlier note's count of 33 -- the
#    CORRECTNESS union says 35, listed verbatim below);
# 2. queries ADDED this round, registered INSIDE the window:
#    funnel_stages_served and quantile_values_served -- the serve-tier
#    certification queries (r11 verdict #3): each materializes its
#    ingest-maintained state into a scratch dir inside the query body
#    and serves from it, so the driver's hash gate pins
#    fold+serve == oracle every round;
# 3. queries whose code paths changed THIS round (round 12):
#    quantile_event_values / quantile_by_event_type / corpus_stats_card
#    (value/token-histogram serve tiers), funnel_stages (fold meta
#    binding + ledger), w1_topk (fold dedupe), j5_asof_join (bucket
#    spec sidecar in the DDL re-registration). The late-r12 staged
#    fold commit (_staged_partition_commit) is exercised under the
#    driver hash gate by the two _served certification queries, which
#    fold state inside their query bodies;
# 4. fill to 50 with the oldest (r10-latest) rows.
# After r12: no query's latest driver row older than r10; the
# remaining 38 r10-latest rows rotate across r13-r14.
_WINDOW_PRIORITY = [
    # 1 -- r9-latest (staleness bound; binding, r11 verdict #1)
    "a10_prefix_summary",
    "a11_distinct_pair_counts",
    "a12_refcount_rebuild",
    "a13_intervals",
    "a14_feed_rollup",
    "a16_rollup_revenue",
    "a3_ewma",
    "a6_source_reputation",
    "a7_total_reputation",
    "a8_threat_summary",
    "corpus_curation_v2",
    "corpus_drift_psi",
    "corpus_novelty",
    "dedup_best_of_cluster",
    "dedup_incremental",
    "dedup_semantic",
    "f_ip_codec",
    "j9_semi_anti",
    "lm_bigram_logprob",
    "mixture_temperature",
    "nru_due_selection",
    "p20_passive_dns",
    "p3_list_or_range",
    "p4_suffix_predicate",
    "p7_json_exists",
    "quality_gopher_rules",
    "s10_export_blocklist",
    "s5_point_read",
    "s6_filtered_find",
    "shard_assign",
    "streaming_hh_terms",
    "streaming_quantiles",
    "tags_rules",
    "text_span_dedup",
    "w5_pivot",
    # 2 -- NEW this round (serve-tier certification, r11 verdict #3)
    "funnel_stages_served",
    "quantile_values_served",
    # 3 -- code path changed this round (r12)
    "quantile_event_values",
    "quantile_by_event_type",
    "corpus_stats_card",
    "funnel_stages",
    "w1_topk",
    "j5_asof_join",
    # 4 -- oldest (r10-latest) fill to 50
    "op_merge_snapshot",
    "a5_type_profile",
    "j1_equi_join",
    "p9_warden_filter_dsl",
    "dedup_exact",
    "corpus_curation",
    "multimodal_bytes",
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
