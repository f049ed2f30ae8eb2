"""P-stage unit tests (SURVEY.md §2.3 P1/P2/P3 + grok tool parse)."""

from __future__ import annotations

from pyspark.sql import functions as F

from openfactverification_spark.operators.parse import parse_turns, span_reconstruction
from openfactverification_spark.sources.transcripts import transcripts_df

N = 512


def test_parse_produces_both_kinds(spark):
    recs = parse_turns(transcripts_df(spark, N))
    kinds = {r["record_kind"] for r in recs.select("record_kind").distinct().collect()}
    assert kinds == {"claim", "tool_call"}


def test_span_invariant_all_turns(spark):
    """P3 contract: spans joined in claim_idx order tile the turn text exactly
    (reference: factcheck/core/Decompose.py:92-107)."""
    recs = parse_turns(transcripts_df(spark, N))
    bad = span_reconstruction(recs).filter(~F.col("spans_ok")).count()
    assert bad == 0


def test_span_substring_matches_claim(spark):
    """Every claim equals substring(text, span_start+1, span_end-span_start)."""
    recs = parse_turns(transcripts_df(spark, N)).filter(F.col("record_kind") == "claim")
    bad = recs.filter(
        F.expr("substring(text, span_start + 1, span_end - span_start) <> claim")
    ).count()
    assert bad == 0


def test_tool_call_grok_fields(spark):
    recs = parse_turns(transcripts_df(spark, N)).filter(F.col("record_kind") == "tool_call")
    rows = recs.select("tool_name", "tool_query", "tool_status").collect()
    assert rows, "expected tool turns"
    for r in rows:
        assert r["tool_name"] in {"search", "calc", "browse", "code"}
        assert r["tool_status"] in {"ok", "error", "timeout"}
        assert len(r["tool_query"]) >= 3


def test_parse_conservation(spark):
    """Fan-out conservation: claim rows == sum of per-turn sentence counts; every
    non-tool turn is represented (no row loss through explode)."""
    tx = transcripts_df(spark, N)
    recs = parse_turns(tx)
    n_claim_turns = recs.filter(F.col("record_kind") == "claim").select(
        "conv_id", "turn_idx"
    ).distinct().count()
    n_tool_turns = recs.filter(F.col("record_kind") == "tool_call").count()
    assert n_claim_turns + n_tool_turns == N


def test_parse_is_shuffle_free(spark):
    """Scale guard: the parse stage must not introduce an exchange."""
    plan = parse_turns(transcripts_df(spark, N))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
