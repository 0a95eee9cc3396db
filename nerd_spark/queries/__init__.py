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

# The inventory (91) exceeds the driver's 50-entry correctness
# window, so the window front is hand-prioritized each round:
# 1. queries that FAILED last round (the r03 fmp pair — the NTZ
#    regression — must show green driver rows this round),
# 2. queries NEW this round (the six round-4 operators),
# 3. queries whose implementation CHANGED this round (minhash band
#    refactor, prebuilt-index IVF, the summary-table A-family
#    rewrites) and the NTZ-recovered ones that lost their r03 rows,
# 4. the flagship §3 pipelines,
# then the S/P/J/W relational core in registration order. Unchanged
# queries green in earlier rounds rotate out; every query keeps its
# full-inventory check in tests/test_oracle_diff.py.
_WINDOW_PRIORITY = [
    # 1 — r03 failures, fixed this round
    "fmp_score",
    "fmp_training_frame",
    # 2 — new this round
    "mixture_sample",
    "shard_assign",
    "tfidf_top_terms",
    "dedup_incremental",
    "quality_model_filter",
    "lm_unigram_logprob",
    "dedup_best_of_cluster",
    "leakage_safe_split",
    # 3 — changed / NTZ-recovered this round
    "ann_ivf_indexed",
    "dedup_minhash_lsh",
    "a1_daily_rollup",
    "a7_total_reputation",
    "a11_distinct_pair_counts",
    "op_array_upsert_rebuild",
    "sessionize_stats",
    "a13_intervals",
    "streaming_daily_counts",
    # 4 — flagship §3 pipelines
    "ip_records",
    "read_path_typed",
    "read_path_search",
    "s4_misp_upserts",
    "nru_due_selection",
    "q1_pricing_summary",
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
