"""T3: greedy non-overlapping passage selection — the one inherently sequential
per-group operator (SURVEY.md §2.6 T3, §2.9 'the only UDTF-shaped thing').

The reference scans score-sorted passages and rejects interval overlaps, capping
at 5 per search result (/root/reference/factcheck/core/Retriever/base.py:174-197,
param :28). Order within a group is load-bearing, so this is `applyInPandas`
(grouped-map pandas UDF): Spark shuffles on doc_id, each group is solved in one
vectorized-ish Python call, and the scheduler parallelizes across groups — the
correct shape for sequential-per-key logic at any scale (group size is bounded
by document length, not table size).

Scores are a deterministic portable hash of the chunk text, so re-runs and both
parallelism levels select identical passages.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MAX_PASSAGES = 5  # base.py:28 max_passages_per_search_result_to_return

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("start_word", T.IntegerType(), False),
        T.StructField("end_word", T.IntegerType(), False),
        T.StructField("score", T.LongType(), False),
        T.StructField("sel_rank", T.IntegerType(), False),
    ]
)


def chunk_score(text: str) -> int:
    """28-bit md5-prefix hash — same formula as functions/hashing.h7, computed
    driver/worker-side in Python for the pandas path."""
    return int(hashlib.md5(text.encode("utf-8")).hexdigest()[:7], 16)


def select_passages_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Greedy per-doc selection: score desc (tie: start_word), reject overlaps,
    cap MAX_PASSAGES. Pure function of one group — reused by tests as the
    reference implementation.

    The overlap predicate mirrors the reference exactly
    (/root/reference/factcheck/core/Retriever/base.py:174-182): a candidate is
    rejected iff one of ITS endpoints falls inside an already-chosen interval
    (a candidate strictly containing a chosen passage would be admitted there).
    The reference's end index is inclusive; ours is exclusive, so
    cand.start ∈ [s, e-1] becomes s <= cs < e and cand.end-1 ∈ [s, e-1]
    becomes s < ce <= e. For sliding-window chunk geometry (an earlier chunk
    never strictly contains a later one) this is equivalent to any-intersection,
    but the predicate is now the reference's, not an approximation."""
    pdf = pdf.sort_values(["score", "start_word"], ascending=[False, True])
    chosen: list[tuple[int, int, int]] = []  # (start, end, score)
    for row in pdf.itertuples(index=False):
        if len(chosen) >= MAX_PASSAGES:
            break
        if any(
            (s <= row.start_word < e) or (s < row.end_word <= e) for s, e, _ in chosen
        ):
            continue
        chosen.append((row.start_word, row.end_word, row.score))
    doc_id = int(pdf["doc_id"].iloc[0]) if len(pdf) else 0
    return pd.DataFrame(
        [
            {
                "doc_id": doc_id,
                "start_word": s,
                "end_word": e,
                "score": sc,
                "sel_rank": i + 1,
            }
            for i, (s, e, sc) in enumerate(chosen)
        ],
        columns=["doc_id", "start_word", "end_word", "score", "sel_rank"],
    )


def _select_batches(batches):
    """mapInPandas worker: greedy-select per doc, many docs per Arrow batch.

    Input partitions are doc_id-partitioned and doc_id-sorted, but a doc's rows
    may still straddle Arrow batch boundaries, so the trailing (possibly
    incomplete) doc of each batch is carried into the next."""
    carry: pd.DataFrame | None = None
    for pdf in batches:
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        if not len(pdf):
            continue
        last_doc = pdf["doc_id"].iloc[-1]
        main = pdf[pdf["doc_id"] != last_doc]
        carry = pdf[pdf["doc_id"] == last_doc]
        if len(main):
            yield pd.concat(
                [select_passages_pdf(g) for _, g in main.groupby("doc_id", sort=False)],
                ignore_index=True,
            )
    if carry is not None and len(carry):
        yield pd.concat(
            [select_passages_pdf(g) for _, g in carry.groupby("doc_id", sort=False)],
            ignore_index=True,
        )


def select_passages(chunks: DataFrame) -> DataFrame:
    """chunks(doc_id, start_word, end_word, chunk_text) -> selected passages.
    Expects scores precomputed in a `score` column (use with_scores).

    Execution shape: repartition on doc_id + sortWithinPartitions, then ONE
    mapInPandas pass that solves thousands of docs per Arrow batch. The naive
    groupBy().applyInPandas calls Python once PER GROUP, whose fixed per-call
    overhead dominates at high group cardinality (measured 15.6s -> ~1s for 5k
    docs at sf0.1); per-doc sequential greediness is preserved because every
    doc's rows land in one partition and the batch iterator carries
    boundary-straddling docs forward."""
    return (
        chunks.select("doc_id", "start_word", "end_word", "score")
        .repartition("doc_id")
        .sortWithinPartitions("doc_id")
        .mapInPandas(_select_batches, _OUT_SCHEMA)
    )


def with_scores(chunks: DataFrame) -> DataFrame:
    """Attach the portable JVM-side score (same value chunk_score computes in
    Python): cast(conv(substring(md5(chunk_text),1,7),16,10) as bigint)."""
    from pyspark.sql import functions as F

    return chunks.withColumn(
        "score",
        F.conv(F.substring(F.md5(F.col("chunk_text")), 1, 7), 16, 10).cast("bigint"),
    )
