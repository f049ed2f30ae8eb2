"""Salted two-phase windowing == naive window, including on a skewed
mega-conversation fixture (skew_pct funnels turns into conv-mega)."""

from __future__ import annotations

from openfactverification_spark.operators import parse as parse_ops
from openfactverification_spark.operators import skew as skew_ops
from openfactverification_spark.sources.transcripts import transcripts_df


def _records(spark, n, skew_pct=0):
    return parse_ops.parse_turns(transcripts_df(spark, n, skew_pct=skew_pct))


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_salted_equals_naive_uniform(spark):
    rec = _records(spark, 2000)
    naive = skew_ops.running_claim_count_naive(rec)
    salted = skew_ops.running_claim_count_salted(rec, block=7)  # force many blocks
    assert _rows(naive) == _rows(salted)


def test_salted_equals_naive_mega_conversation(spark):
    rec = _records(spark, 4000, skew_pct=30)  # 30% of turns in conv-mega
    naive = skew_ops.running_claim_count_naive(rec)
    salted = skew_ops.running_claim_count_salted(rec, block=50)
    assert _rows(naive) == _rows(salted)
    # sanity: the mega conversation really is orders bigger than the rest
    mega = naive.filter("conv_id = 'conv-mega'").count()
    assert mega > 1000
