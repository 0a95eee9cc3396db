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
# Round-5 rotation:
# 1. queries NEW or CHANGED this round — corpus_curation_v2 (new
#    flagship), the fmp pair (now the full 39-feature/10-blacklist
#    vector), streaming_daily_counts (gained a real SQL oracle), the
#    cluster-consuming trio (components.py contraction rewrite), the
#    keyword pair (empty-term filter), and the A-family heads (the
#    summary staleness-guard rewrite of _daily),
# 2. every query WITHOUT a CORRECTNESS_r04 row (rotated out last
#    round — none may age past two rounds without a fresh driver
#    row). The two forever-rows-only approximate queries
#    (a2_window_totals_approx, ann_ivf_trained) rotate out instead;
#    their accuracy evidence is pytest-side.
# Everything else was driver-green in r4 and keeps its
# full-inventory check in tests/test_oracle_diff.py.
_WINDOW_PRIORITY = [
    # 1 — new / changed this round
    "corpus_curation_v2",
    "fmp_score",
    "fmp_training_frame",
    "streaming_daily_counts",
    "dedup_clusters",
    "dedup_best_of_cluster",
    "leakage_safe_split",
    "tfidf_top_terms",
    "lm_unigram_logprob",
    "a1_daily_rollup",
    "a7_total_reputation",
    # 2 — no r4 driver row (r1–r3 green; re-cover now)
    "set_ops_union",
    "w6_rank_lag",
    "a6_rep_dshield",
    "a6_rep_blacklists",
    "a7_total_multi",
    "p11_threat_categorization",
    "tags_rules",
    "j4_range_join_bucketed",
    "a2_window_totals",
    "a3_ewma",
    "a5_type_profile",
    "a6_source_reputation",
    "a8_threat_summary",
    "a10_prefix_summary",
    "a12_refcount_rebuild",
    "a14_feed_rollup",
    "a16_rollup_revenue",
    "op_merge_snapshot",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "contamination_check",
    "train_val_split",
    "sequence_packing",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "ann_cosine_topk",
    "ann_lsh_bucket_topk",
    "emb_centroids",
    "text_quality",
    "text_langid",
    "text_token_stats",
    "text_pii_scrub",
    "text_repetition",
    "text_fingerprint",
    "multimodal_bytes",
    "ann_ivf_topk",
    "dedup_embedding_cosine",
    "corpus_curation",
    # slot 50 filler (r4-green; keeps the window exactly full)
    "mixture_sample",
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
