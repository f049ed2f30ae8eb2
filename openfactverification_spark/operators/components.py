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


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al. §3): for every node u with
    neighborhood N(u), connect each LARGER neighbor directly to
    min(N(u) ∪ {u}). Input/output: unordered unique pairs as (hi, lo) with
    hi > lo."""
    sym = edges.selectExpr("hi AS u", "lo AS v").unionByName(
        edges.selectExpr("lo AS u", "hi AS v")
    )
    m = sym.groupBy("u").agg(F.min("v").alias("mn")).select(
        "u", F.least("u", F.col("mn")).alias("m")
    )
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
        .filter(F.col("hi") > F.col("lo"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: group the (hi, lo) edges by their larger endpoint
    u; with m = min of u's smaller neighbors, connect u and every smaller
    neighbor to m. Output: (hi, lo) pairs, hi > lo."""
    m = edges.groupBy("hi").agg(F.min("lo").alias("m"))
    via_neighbors = (
        edges.join(m, "hi")
        .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
        .filter(F.col("hi") > F.col("lo"))
    )
    via_center = m.select(F.col("hi"), F.col("m").alias("lo"))
    return via_neighbors.unionByName(via_center).distinct()


def _edge_sig(edges: DataFrame) -> tuple:
    """(count, order-independent xxhash64 checksum) of an edge set, in ONE
    aggregate job. The star loop's convergence test used to run two
    exceptAll(...).isEmpty() jobs per round (each a full shuffle); equal
    signatures imply set equality up to a ~2^-64-per-round hash-collision
    risk, which the MAX_ROUNDS backstop and the equality-vs-naive tests
    bound. Halves the per-round job count at scale."""
    # bit_xor, not sum: order-independent like sum but cannot overflow under
    # ANSI mode, and the edge set is distinct so xor-cancellation of repeated
    # rows can't occur.
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(hi, lo))").alias("sig"),
    ).collect()[0]
    return (row["n"], row["sig"])


def connected_components_star(nodes: DataFrame, pairs: DataFrame) -> DataFrame:
    """Connected components via alternating large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
    — the extreme-scale path: converges in O(log^2 n) rounds with the edge set
    CONTRACTING every round (plain label propagation needs O(diameter) rounds
    over the full edge set). Same output contract as connected_components:
    (doc_id, component_id = component min, is_keeper); equality is pinned by
    tests on random graphs."""
    edges = (
        pairs.selectExpr(
            "greatest(id_a, id_b) AS hi", "least(id_a, id_b) AS lo"
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    sig = _edge_sig(edges)
    for _ in range(MAX_ROUNDS):
        new_edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        new_sig = _edge_sig(new_edges)
        edges = new_edges
        if new_sig == sig:
            break
        sig = new_sig

    # fixpoint edges are stars (node -> component min); singletons self-label
    labels = edges.selectExpr("hi AS doc_id", "lo AS comp")
    return (
        nodes.join(labels, "doc_id", "left")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.coalesce(F.col("comp"), F.col("doc_id")).cast("long").alias("component_id"),
        )
        .withColumn("is_keeper", F.col("component_id") == F.col("doc_id"))
    )


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
