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

__all__ = ["REGISTRY", "ORACLE"]
