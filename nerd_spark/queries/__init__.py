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

# The inventory (83) exceeds the driver window (50), so the window
# tail is hand-picked: queries NEW or CHANGED this round — the four
# round-4 operators (mixture sampling, shard assignment, TF-IDF
# keywords, incremental dedup), the on-disk IVF path (index build
# moved to the layout pass), and the NTZ-affected queries that lost
# their r03 rows to the timestamp regression (sessionize, intervals,
# streaming rollup). Unchanged queries that were driver-green in
# earlier rounds rotate out; every query keeps its full-inventory
# check in tests/test_oracle_diff.py.
_WINDOW_TAIL = [
    "mixture_sample",
    "shard_assign",
    "tfidf_top_terms",
    "dedup_incremental",
    "quality_model_filter",
    "ann_ivf_indexed",
    "dedup_minhash_lsh",
    "sessionize_stats",
    "a13_intervals",
    "streaming_daily_counts",
]


def _order_for_window() -> None:
    missing = [n for n in _WINDOW_TAIL if n not in REGISTRY]
    if missing:
        raise KeyError(f"window-tail queries not registered: {missing}")
    head = [n for n in REGISTRY if n not in _WINDOW_TAIL][: 50 - len(_WINDOW_TAIL)]
    ordered = head + _WINDOW_TAIL + [
        n for n in REGISTRY if n not in head and n not in _WINDOW_TAIL
    ]
    for reg in (REGISTRY, ORACLE):
        snap = dict(reg)
        reg.clear()
        reg.update((n, snap[n]) for n in ordered if n in snap)


_order_for_window()

__all__ = ["REGISTRY", "ORACLE"]
