"""Lloyd's k-means to convergence over an embedding column — the iterative
refinement loop behind the IVF/SemDeDup centroids (q_embed_ivf_ann and
q_semantic_dedup take a `centroids=` list; this produces it).

Shape (the classic centroids-on-driver Lloyd's): the data never leaves the
cluster — each round is one scan assigning vectors to their nearest centroid
via a loop-form lambda projection (zero shuffle; the centroid matrix is a
constant folded into codegen, i.e. the broadcast-join shape against a tiny
centroid table), followed by an unpivot → groupBy(cell, pos) mean whose
exchange carries (k x dim) rows regardless of N. Only the k x dim centroid
matrix is collected per round — that IS the model, and it is tiny by
construction.

Convergence: stop when the max absolute per-coordinate centroid drift is
<= tol, or at max_rounds (the components.py pattern: a cheap driver-side
check per round, a hard backstop). Means are rounded to 6 dp per round so the
trajectory is reproducible across partitionings (parallel double summation
order otherwise leaks into the result) — the same determinism rule as
q_embed_kmeans_converged, whose fixed-round output equals this loop's
intermediate state at that round (pinned by tests).

Empty cells keep their previous centroid (no respawn heuristic — matches the
SQL twin so the two stay comparable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 25


def _assign(vectors: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """(vec_id, embedding) -> + cell_id of the nearest centroid by dot
    product; ties break to the lowest cell (first-occurrence array_position).
    Pure projection — loop-form lambda per the 64KB codegen rule."""
    k, dim = len(centroids), len(centroids[0])
    cm = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    darr = F.expr(
        f"transform(sequence(0, {k - 1}), i -> aggregate(sequence(0, {dim - 1}), "
        "cast(0 as double), (acc, j) -> acc + cast(element_at(embedding, j + 1) as double)"
        " * element_at(element_at(cm, i + 1), j + 1)))"
    )
    return (
        vectors.withColumn("cm", cm)
        .withColumn("darr", darr)
        .withColumn(
            "cell_id",
            F.expr("cast(array_position(darr, array_max(darr)) - 1 as int)"),
        )
        .drop("cm", "darr")
    )


def kmeans_refine(
    vectors: DataFrame,
    seeds: list[list[float]],
    max_rounds: int = MAX_ROUNDS,
    tol: float = 1e-4,
) -> tuple[list[list[float]], int]:
    """Refine `seeds` over vectors(vec_id, embedding) until max centroid
    drift <= tol. Returns (centroids, rounds_run)."""
    k, dim = len(seeds), len(seeds[0])
    centroids = [[round(float(x), 6) for x in c] for c in seeds]
    for rnd in range(1, max_rounds + 1):
        means = (
            _assign(vectors, centroids)
            .select("cell_id", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cell_id", "pos")
            .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("val"))
            .collect()
        )
        got = {(r["cell_id"], r["pos"]): r["val"] for r in means}
        new = [
            [got.get((c, j), centroids[c][j]) for j in range(dim)] for c in range(k)
        ]
        drift = max(
            abs(new[c][j] - centroids[c][j]) for c in range(k) for j in range(dim)
        )
        centroids = new
        if drift <= tol:
            return centroids, rnd
    return centroids, max_rounds


def within_cluster_ssd(vectors: DataFrame, centroids: list[list[float]]) -> float:
    """Mean squared distance of each vector to its assigned centroid — the
    Lloyd's objective; must be non-increasing round over round."""
    k, dim = len(centroids), len(centroids[0])
    cm = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    sq = F.expr(
        f"aggregate(sequence(0, {dim - 1}), cast(0 as double), (acc, j) -> "
        "acc + pow(cast(element_at(embedding, j + 1) as double)"
        " - element_at(element_at(cm, cell_id + 1), j + 1), 2))"
    )
    row = (
        _assign(vectors, centroids)
        .withColumn("cm", cm)
        .withColumn("sq", sq)
        .agg(F.avg("sq").alias("ssd"))
        .collect()[0]
    )
    return float(row["ssd"])
