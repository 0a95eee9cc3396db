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

# The inventory (92) exceeds the driver's 50-entry correctness
# window, so the window front is hand-prioritized each round.
# Round-6 rotation:
# 1. queries CHANGED this round — dedup_best_of_cluster (member-only
#    scoring semi-join), a2_window_totals (precomputed-window serve
#    path; raw-dir fallback is what the driver exercises, but the
#    plan changed), p11_threat_categorization (sandbox guards), the
#    minhash/LSH family + curation funnel (the _spread width-probe
#    rewrite sits under all of them),
# 2. every query WITHOUT a CORRECTNESS_r05 row — the r5-verdict
#    ≤2-round staleness invariant (all were r4-green; includes the
#    two forever-rows-only approximate queries a2_window_totals_approx
#    and ann_ivf_trained, whose rows-only driver check refreshes too).
# Everything else was driver-green in r5 and keeps its
# full-inventory check in tests/test_oracle_diff.py.
_WINDOW_PRIORITY = [
    # 1 — new / changed this round
    "text_span_dedup",
    "dedup_semantic",
    "quality_gopher_rules",
    "mixture_temperature",
    "dedup_best_of_cluster",
    "a2_window_totals",
    "p11_threat_categorization",
    "dedup_minhash_lsh",
    "corpus_curation_v3",
    "corpus_curation_v2",
    # (leakage_safe_split and dedup_incremental were r5-green and sit
    # on covered paths — rotated out to keep the 42 stale queries in)
    # (dedup_ngram_jaccard also sits on the changed _spread path but
    # was r5-green and the path is covered by the minhash entries
    # above — dropped to keep all 42 stale queries inside the window)
    # 2 — no r5 driver row (r4-green; ≤2-round staleness invariant)
    "a11_distinct_pair_counts",
    "a13_intervals",
    "a2_window_totals_approx",
    "ann_ivf_indexed",
    "ann_ivf_trained",
    "f_ip_codec",
    "ip_records",
    "j1_equi_join",
    "j2_enrichment_chain",
    "j4_range_join",
    "j5_asof_join",
    "j6_bulk_lookup",
    "j8_group_stats_join_back",
    "j9_semi_anti",
    "nru_due_selection",
    "op_array_upsert_rebuild",
    "p10_validity_filter",
    "p1_projection",
    "p2_range_predicate",
    "p3_list_or_range",
    "p4_suffix_predicate",
    "p5_multi_value_and_or",
    "p6_elem_match",
    "p7_json_exists",
    "p8_semijoin",
    "p9_warden_filter_dsl",
    "q1_pricing_summary",
    "quality_model_filter",
    "read_path_search",
    "read_path_typed",
    "s10_export_blocklist",
    "s4_misp_upserts",
    "s5_point_read",
    "s6_filtered_find",
    "s8_event_fetch",
    "sessionize_stats",
    "shard_assign",
    "w1_topk",
    "w4_last_n_per_key",
    "w5_pivot",
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
