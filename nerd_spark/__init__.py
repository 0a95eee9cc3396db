"""nerd_spark — a PySpark-native entity-analytics engine.

A from-scratch rebuild of the capabilities of CESNET/NERD (Network Entity
Reputation Database) on Apache Spark: streaming event ingest, an
update-op merge algebra, deterministic derivation pipelines (event
counters, EWMA, reputation, threat-category summaries, tags), an
entity-graph query surface, and large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing).

Architecture is Spark-first: everything is declared through the
DataFrame/SQL API so Catalyst/Tungsten pick the physical strategy;
Pandas UDFs are used only where built-ins cannot express the semantics.

See SURVEY.md for the operator contract this package implements.
"""

__version__ = "0.1.0"
