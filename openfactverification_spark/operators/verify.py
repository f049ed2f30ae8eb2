"""V-stage: query fan-out and ranked evidence retrieval (SURVEY.md §2 T1/T2/T5,
U2, J6/J7).

The reference's QueryGenerator caps queries at 5 with the claim itself first
(/root/reference/factcheck/core/QueryGenerator.py:56-59); its retriever keeps
top_k=3 results per query (/root/reference/factcheck/core/Retriever/
serper_retriever.py:20,101). Both become pure array ops + a per-key window —
no positional zip anywhere: claim identity (conv_id, turn_idx, claim_idx) rides
every exploded row (SURVEY.md §1.4's "never positional" rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MAX_QUERY_PER_CLAIM = 5  # QueryGenerator.py:7
EVIDENCE_TOP_K = 3  # serper_retriever.py:20

# Deterministic stand-ins for the LLM's generated queries (shape + cap semantics
# are the operator under test, not the wording).
QUERY_TEMPLATES = ("Did ", "Evidence for: ", "Source of: ", "Is it true that ", "Verify: ")


def generate_queries(claims: DataFrame) -> DataFrame:
    """T5 + U2: checkworthy claims -> one row per (claim, query), claim-as-query
    first, capped at MAX_QUERY_PER_CLAIM. posexplode keeps the query ordinal."""
    generated = F.array(*[F.concat(F.lit(t), F.col("claim")) for t in QUERY_TEMPLATES])
    qs = F.slice(
        F.concat(F.array(F.col("claim")), generated), 1, MAX_QUERY_PER_CLAIM
    )
    return (
        claims.filter((F.col("record_kind") == "claim") & F.col("checkworthy"))
        .select(
            "conv_id",
            "turn_idx",
            "claim_idx",
            "claim",
            F.posexplode(qs).alias("query_idx", "query"),
        )
    )


def evidence_topk(claims: DataFrame, ev_dim: DataFrame, k: int = EVIDENCE_TOP_K) -> DataFrame:
    """T1/T2 + J6/J7: broadcast-join the evidence corpus onto checkworthy claims
    and keep the top-k evidences per claim by rank (per-key window, ties broken
    by url for determinism)."""
    w = Window.partitionBy("conv_id", "turn_idx", "claim_idx").orderBy("rank", "url")
    return (
        claims.filter((F.col("record_kind") == "claim") & F.col("checkworthy"))
        .select("conv_id", "turn_idx", "claim_idx", "claim_norm")
        .join(F.broadcast(ev_dim), "claim_norm")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "conv_id",
            "turn_idx",
            "claim_idx",
            F.col("rank").alias("rank"),
            "url",
            "stance",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def evidence_regrouped(claims: DataFrame, ev_dim: DataFrame) -> DataFrame:
    """A3: evidence detail rows regrouped per claim with a deterministic order —
    collect_list + array_sort (never arrival order), flattened to a joined string
    so both engines can compare it byte-for-byte."""
    detail = (
        claims.filter((F.col("record_kind") == "claim") & F.col("checkworthy"))
        .select("conv_id", "turn_idx", "claim_idx", "claim_norm")
        .join(F.broadcast(ev_dim), "claim_norm")
    )
    return detail.groupBy("conv_id", "turn_idx", "claim_idx").agg(
        F.count(F.lit(1)).alias("n_evidence_rows"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "url"))),
                lambda x: x["url"],
            ),
            ",",
        ).alias("urls_ordered"),
    )
