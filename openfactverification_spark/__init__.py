"""openfactverification_spark — a from-scratch PySpark-native re-expression of
Libr-AI/OpenFactVerification ("Loki") as a log/telemetry parse → enrich → route →
aggregate pipeline over multi-turn agent transcripts.

Reference semantics (read-only, /root/reference) are re-expressed Spark-first:
  * parse   (Loki Decompose, factcheck/core/Decompose.py)       → vectorized regex parse
  * enrich  (Loki CheckWorthy + retrieval, CheckWorthy.py)      → broadcast lookup joins
  * route   (checkworthy/non-factual/tool-trace/verdict split)  → tag-driven fan-out
  * aggregate (ClaimVerify stance counts + FCSummary)           → conditional groupBy aggs

See SURVEY.md for the operator-by-operator mapping.
"""

__version__ = "0.1.0"
