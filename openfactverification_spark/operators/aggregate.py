"""A-stage: per-sink conditional aggregates (SURVEY.md §2.5 A1/A2/A3).

FCSummary (/root/reference/factcheck/utils/data_class.py:80-100 and the counting at
factcheck/__init__.py:199-219) recast per (route, conv_id, role) with a global
rollup. All counts are single-pass `sum(when(...))` — partial (map-side) aggregation
comes free from Catalyst, so the only shuffle is the final group exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _summary_aggs() -> list:
    is_claim = F.col("record_kind") == "claim"
    score = F.col("factuality_tag") == "SCORE"
    return [
        F.count(F.lit(1)).alias("n_records"),
        F.sum(is_claim.cast("long")).alias("n_claims"),
        F.sum((is_claim & F.col("checkworthy")).cast("long")).alias("n_checkworthy"),
        F.sum(score.cast("long")).alias("n_verified"),
        F.sum((score & (F.col("factuality") == 1.0)).cast("long")).alias("n_supported"),
        F.sum((score & (F.col("factuality") == 0.0)).cast("long")).alias("n_refuted"),
        F.sum(
            (score & (F.col("factuality") > 0.0) & (F.col("factuality") < 1.0)).cast("long")
        ).alias("n_controversial"),
        F.sum((F.col("tool_status") == "error").cast("long")).alias("n_tool_errors"),
        F.round(F.avg(F.when(score, F.col("factuality"))), 6).alias("avg_factuality"),
    ]


def sink_summary(routed: DataFrame, per_conv: bool = False) -> DataFrame:
    """A2: summary counts per (route, role[, conv_id])."""
    keys = ["route", "role"] + (["conv_id"] if per_conv else [])
    return routed.groupBy(*keys).agg(*_summary_aggs())


def summary_rollup(routed: DataFrame) -> DataFrame:
    """A2 global extension: rollup(route, role) — per-sink, per-(sink,role), and
    grand-total rows in one pass (grouping sets, one shuffle)."""
    return routed.rollup("route", "role").agg(
        *_summary_aggs(), F.grouping_id().alias("grouping_level")
    )


def claim_verdicts(routed: DataFrame) -> DataFrame:
    """Per-claim verdict rows (the ClaimDetail projection,
    /root/reference/factcheck/utils/data_class.py:40-66)."""
    return routed.filter(F.col("record_kind") == "claim").select(
        "conv_id",
        "turn_idx",
        "claim_idx",
        "role",
        "claim",
        "checkworthy",
        "reason",
        "n_supports",
        "n_refutes",
        "n_evidence",
        F.round("factuality", 6).alias("factuality"),
        "factuality_tag",
        "route",
    )


def evidences_grouped(evidence_detail: DataFrame) -> DataFrame:
    """A3: regroup evidence detail rows to one array<struct> per claim
    (/root/reference/factcheck/core/ClaimVerify.py:93-96). Uses sort_array for a
    deterministic order instead of relying on arrival order."""
    return evidence_detail.groupBy("conv_id", "turn_idx", "claim_idx", "claim").agg(
        F.array_sort(
            F.collect_list(F.struct("rank", "url", "stance", "evidence_text"))
        ).alias("evidences"),
        F.count(F.col("url")).alias("n_evidence_rows"),
    )
