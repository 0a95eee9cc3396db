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

# The inventory (122) exceeds the driver's 50-entry correctness
# window, so the window front is hand-prioritized each round.
# Round-9 rotation:
# 1. the 24 r6-latest queries the r8 trim scheduled first ("all
#    rotate FIRST into r9") — the ≤2-round staleness invariant is
#    binding on them this round;
# 2. the queries NEW this round: streaming_quantiles (the oracled
#    streaming serve over the quantile family's histogram state),
#    corpus_drift_psi and corpus_novelty (the snapshot-monitoring
#    pair); their two extra slots trim dedup_exact and
#    a5_type_profile from the tier-4 fill — dedup_exact keeps five
#    operators/dedup.py siblings in-window, a5's window-table serve
#    path is pytest-pinned (test_summary_window) and seven other
#    A-family rows stay in-window;
# 3. every query whose CODE PATH changed this round and therefore
#    needs a fresh driver row regardless of age: the quantile family
#    (probe-chosen histogram strategy + narrowed refine:
#    quantile_event_values/by_event_type/corpus_stats_card), the
#    bigram kernel rewrite (lm_bigram_logprob), the top_frequent
#    degenerate guard (top_frequent_users), the dedup index size gate
#    + bounded candidate broadcast (dedup_incremental), the unhinted
#    membership join (p20_passive_dns), the _SUCCESS-gated epoch
#    serving (streaming_hh_terms), and the shared input-bytes
#    estimator refactor (text_token_stats);
# 4. r7-latest fill (14): the analytics A-family core, both headline
#    relational aggregates, ML scoring, the tags DSL and the streaming
#    baseline. The 30 r7-latest queries left out all
#    have an unchanged code path this round AND a fresher sibling
#    in-window: the ann_* family's trained/pq/ivfpq siblings are
#    r8-golden; text_quality/langid/pii/repetition/fingerprint share
#    functions/text.py with in-window text_token_stats and
#    corpus_stats_card; dedup_ngram/clusters/simhash/embedding share
#    operators/dedup.py+components.py with in-window
#    dedup_minhash_lsh/dedup_incremental/best_of_cluster/semantic/
#    span; train_val/leakage/packing/mixture_sample share
#    operators/sampling.py with in-window shard_assign and
#    mixture_temperature; tfidf_top_terms/lm_unigram_logprob share
#    operators/keywords.py with in-window lm_bigram_logprob;
#    p12/p13/p14 share plans/enrich.py with in-window p20;
#    set_ops_union/w6_rank_lag/a7_total_multi share
#    queries/relational.py with in-window w5/j9/p3/p4/p7;
#    corpus_curation composes the in-window v2/v3 funnels;
#    dedup_exact keeps five operators/dedup.py siblings in-window
#    (minhash_lsh, incremental, best_of_cluster, semantic, span).
#    They sit at the staleness bound and rotate FIRST into r10.
_WINDOW_PRIORITY = [
    # 1 — r6-latest (staleness bound, scheduled by the r8 trim)
    "a2_window_totals",
    "j4_range_join",
    "w5_pivot",
    "f_ip_codec",
    "dedup_minhash_lsh",
    "corpus_curation_v2",
    "corpus_curation_v3",
    "s5_point_read",
    "s6_filtered_find",
    "s10_export_blocklist",
    "p3_list_or_range",
    "p4_suffix_predicate",
    "p7_json_exists",
    "j9_semi_anti",
    "a11_distinct_pair_counts",
    "a13_intervals",
    "op_array_upsert_rebuild",
    "nru_due_selection",
    "shard_assign",
    "dedup_best_of_cluster",
    "text_span_dedup",
    "dedup_semantic",
    "quality_gopher_rules",
    "mixture_temperature",
    # 2 — new this round (corpus_drift_psi displaces dedup_exact from
    #     the tier-4 fill: operators/dedup.py keeps FIVE in-window
    #     representatives — dedup_minhash_lsh, dedup_incremental,
    #     best_of_cluster, semantic, span)
    "streaming_quantiles",
    "corpus_drift_psi",
    "corpus_novelty",
    # 3 — code path changed this round
    "quantile_event_values",
    "quantile_by_event_type",
    "corpus_stats_card",
    "lm_bigram_logprob",
    "top_frequent_users",
    "dedup_incremental",
    "p20_passive_dns",
    "streaming_hh_terms",
    "text_token_stats",
    # 4 — r7-latest fill
    "q1_pricing_summary",
    "a16_rollup_revenue",
    "a1_daily_rollup",
    "a3_ewma",
    "a6_source_reputation",
    "a7_total_reputation",
    "a8_threat_summary",
    "a10_prefix_summary",
    "a12_refcount_rebuild",
    "a14_feed_rollup",
    "tags_rules",
    "fmp_score",
    "op_merge_snapshot",
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
