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

# Importing the family modules populates the registry.
from nerd_spark.queries import analytics  # noqa: E402,F401
from nerd_spark.queries import dataprep  # noqa: E402,F401
from nerd_spark.queries import recordq  # noqa: E402,F401
from nerd_spark.queries import relational  # noqa: E402,F401
from nerd_spark.queries import reputationq  # noqa: E402,F401
from nerd_spark.queries import streamingq  # noqa: E402,F401
from nerd_spark.queries import surface  # noqa: E402,F401

__all__ = ["REGISTRY", "ORACLE"]
