"""Connected components over near-duplicate pairs — dedup cluster assignment.

A pair list (dedup_minhash_lsh / dedup_simhash_banded / embed_dup_pairs_lsh)
is only half of deduplication: production pipelines must transitively close
the pairs into CLUSTERS and pick one keeper per cluster (A ~ B and B ~ C must
collapse to one document even when A ~ C was never emitted). This is the one
genuinely iterative algorithm in the repo.

Spark implementation: min-label propagation. Every doc starts labeled with its
own id; each round, every node adopts the minimum label among itself and its
neighbors; converged when a round changes nothing. Rounds needed = graph
diameter; near-dup clusters are shallow (pairs chain through shared content),
so convergence is fast. Each round is one shuffle keyed on the node id —
O(diameter) shuffles total, each linear in |edges|.

Scale notes (10^12 docs): this plain propagation is the textbook baseline; at
extreme scale you switch to large-star/small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14), which contracts the graph every
round and converges in O(log^2 n) with shrinking edge sets. The loop below
keeps labels checkpoint-persisted per round so the lineage doesn't grow
unboundedly — the same reason GraphX/iterative jobs checkpoint.

The DuckDB oracle (dual.dedup_components_oracle) expresses the same fixpoint
as a recursive CTE computing min-label transitive closure — feasible because
the oracle runs at test scale; it is the semantic spec, not the scale plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 50  # backstop; near-dup graph diameter is far smaller


def connected_components(nodes: DataFrame, pairs: DataFrame) -> DataFrame:
    """nodes(doc_id) x pairs(id_a, id_b) -> (doc_id, component_id, is_keeper).

    component_id = min doc_id reachable through the pair graph; the keeper is
    the component's minimum id (the same keeper-by-min convention as
    dedup_exact). Deterministic: pure min-aggregation fixpoint.
    """
    edges = (
        pairs.selectExpr("id_a AS src", "id_b AS dst")
        .unionByName(pairs.selectExpr("id_b AS src", "id_a AS dst"))
        .persist()
    )
    labels = nodes.select(
        F.col("doc_id"), F.col("doc_id").alias("comp")
    ).persist()
    labels.count()

    for _ in range(MAX_ROUNDS):
        neighbor_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("comp").alias("neigh_comp"))
        )
        new_labels = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.least(F.col("comp"), F.coalesce(F.col("neigh_comp"), F.col("comp"))).alias(
                "comp"
            ),
        )
        # localCheckpoint materializes the round AND truncates lineage growth
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter("n.comp <> o.comp")
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break

    edges.unpersist()
    return labels.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("comp").cast("long").alias("component_id"),
        (F.col("comp") == F.col("doc_id")).alias("is_keeper"),
    )
