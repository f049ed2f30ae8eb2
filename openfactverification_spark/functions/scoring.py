"""Cross-encoder-shaped passage scoring — the model-inference-at-scale surface.

The reference ranks (query, passage) pairs with a sentence-transformers
cross-encoder (`self.passage_ranker.predict([(query, p) for p in passages])`,
/root/reference/factcheck/core/Retriever/base.py:19-23,167). At cluster scale
that shape is a **batched pandas UDF in the predict_batch_udf pattern**:

  * the model is loaded ONCE per Python worker (not per row, not per batch) —
    for a real model this is where the weights land on the executor;
  * inference runs over Arrow-delivered batches (Iterator[Series] form), so
    the Python boundary is crossed per-batch, never per-row;
  * the score column then feeds ordinary JVM-side ranking (window top-k).

The model here is a deterministic stub (no ML deps in the container): a linear
scorer over three engineered features — distinct-word overlap between query and
passage, capped passage length, and a content hash. Every feature is
SQL-expressible, so the UDF's output is byte-identical to a pure-SQL twin in
BOTH engines (ce_score_sql below renders it for Spark SQL and DuckDB) — which
is what lets the driver oracle-check a "model inference" stage at all. Integer
feature arithmetic divided by 1000.0 at the end keeps the double bit-exact
across Python, the JVM, and DuckDB.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

SCORE_SCALE = 1000
LEN_CAP = 200  # passage-length feature cap (chars)


class CrossEncoderStub:
    """Deterministic stand-in for a cross-encoder ranker: predict() maps
    aligned (query, passage) series to a double score series. Weights are the
    integer coefficients of the feature combination; a real model would hold
    tensors here and this class is exactly where they'd be loaded."""

    def predict(self, queries: pd.Series, passages: pd.Series) -> pd.Series:
        q_words = queries.str.split(" ").apply(set)
        p_words = passages.str.split(" ").apply(set)
        overlap = pd.Series(
            [len(a & b) for a, b in zip(q_words, p_words)], index=passages.index
        )
        cap_len = passages.str.len().clip(upper=LEN_CAP)
        h = passages.apply(
            lambda s: int(hashlib.md5(s.encode("utf-8")).hexdigest()[:7], 16)
            % SCORE_SCALE
        )
        return (overlap * SCORE_SCALE + cap_len * 2 + h) / float(SCORE_SCALE)


def _load_model() -> CrossEncoderStub:
    """Per-worker model load hook (the predict_batch_udf 'make_predict_fn')."""
    return CrossEncoderStub()


def ce_score_udf():
    """predict_batch_udf-pattern scorer factory (built lazily — pandas_udf
    registration needs an active session): model loaded once per worker,
    scored per Arrow batch. Usage:
    df.withColumn('ce_score', ce_score_udf()('claim', 'evidence_text'))."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _score(
        batches: Iterator[tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        model = _load_model()
        for queries, passages in batches:
            yield model.predict(queries, passages)

    return _score


def ce_score_sql(query_col: str, passage_col: str, dialect: str) -> str:
    """The same score as a pure SQL expression — the oracle twin of
    ce_score_udf (and proof the stub is deterministic)."""
    if dialect == "spark":
        overlap = f"size(array_intersect(split({query_col}, ' '), split({passage_col}, ' ')))"
        h = f"(cast(conv(substring(md5({passage_col}), 1, 7), 16, 10) as bigint) % {SCORE_SCALE})"
    else:
        overlap = f"len(list_intersect(string_split({query_col}, ' '), string_split({passage_col}, ' ')))"
        h = f"(('0x' || substr(md5({passage_col}), 1, 7))::BIGINT % {SCORE_SCALE})"
    return (
        f"(({overlap}) * {SCORE_SCALE}"
        f" + least(length({passage_col}), {LEN_CAP}) * 2"
        f" + {h}) / {float(SCORE_SCALE)}"
    )
