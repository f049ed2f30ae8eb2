"""P-stage unit tests (SURVEY.md §2.3 P1/P2/P3 + grok tool parse + rule-packs)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from openfactverification_spark.operators.parse import (
    parse_turns,
    span_reconstruction,
    split_sentences,
)
from openfactverification_spark.rulepack import DEFAULT_PACK_PATH, load_pack
from openfactverification_spark.sources.transcripts import transcripts_df

N = 512


def test_parse_produces_both_kinds(spark):
    recs = parse_turns(transcripts_df(spark, N))
    kinds = {r["record_kind"] for r in recs.select("record_kind").distinct().collect()}
    assert kinds == {"claim", "tool_call"}


def test_span_invariant_all_turns(spark):
    """P3 contract: spans form a gap-free partition of the turn text
    (reference: factcheck/core/Decompose.py:92-107)."""
    recs = parse_turns(transcripts_df(spark, N))
    bad = span_reconstruction(recs).filter(~F.col("spans_ok")).count()
    assert bad == 0


def test_span_substring_matches_claim(spark):
    """Every claim equals trim(substring(text, span_start+1, span_end-span_start))
    — the raw span slice keeps the joining whitespace, the claim is trimmed."""
    recs = parse_turns(transcripts_df(spark, N)).filter(F.col("record_kind") == "claim")
    bad = recs.filter(
        F.expr("trim(substring(text, span_start + 1, span_end - span_start)) <> claim")
    ).count()
    assert bad == 0


def test_cjk_segmentation(spark):
    """CJK terminators (。) split WITHOUT a following space; claims keep the
    terminator, mirroring the ASCII behavior (reference zh path:
    script/minimal_test_zh.json)."""
    df = spark.createDataFrame(
        [("c0", 0, "user", "地球绕着太阳转。长城位于中国。", None)],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.lit("2025-01-01 00:00:00").cast("timestamp"))
    claims = [
        r["claim"]
        for r in parse_turns(df).orderBy("claim_idx").select("claim").collect()
    ]
    assert claims == ["地球绕着太阳转。", "长城位于中国。"]
    assert span_reconstruction(parse_turns(df)).filter(~F.col("spans_ok")).count() == 0


def test_cjk_ascii_mixed_turn(spark):
    df = spark.createDataFrame(
        [("c0", 0, "user", "Water boils at 100 degrees Celsius. 长城位于中国。", None)],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.lit("2025-01-01 00:00:00").cast("timestamp"))
    recs = parse_turns(df)
    claims = [r["claim"] for r in recs.orderBy("claim_idx").select("claim").collect()]
    assert claims == ["Water boils at 100 degrees Celsius.", "长城位于中国。"]
    assert span_reconstruction(recs).filter(~F.col("spans_ok")).count() == 0


def test_abbreviations_do_not_split(spark):
    """Protect rules: 'Dr. Smith' / 'e.g.' stay inside one sentence (the
    Punkt-like behavior of the reference's nltk sent_tokenize)."""
    df = spark.createDataFrame(
        [
            ("c0", 0, "user", "Dr. Smith works at Stanford University. Water is wet.", None),
            ("c0", 1, "user", "Use hashes e.g. md5 for fingerprints. They are fast.", None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.lit("2025-01-01 00:00:00").cast("timestamp"))
    recs = parse_turns(df)
    claims = {
        r["turn_idx"]: [x["claim"] for x in recs.filter(F.col("turn_idx") == r["turn_idx"]).orderBy("claim_idx").collect()]
        for r in recs.select("turn_idx").distinct().collect()
    }
    assert claims[0] == ["Dr. Smith works at Stanford University.", "Water is wet."]
    assert claims[1] == ["Use hashes e.g. md5 for fingerprints.", "They are fast."]
    assert span_reconstruction(recs).filter(~F.col("spans_ok")).count() == 0


def test_rulepack_swap_changes_segmentation(spark):
    """SURVEY §2.9 prompt-plugin analog: loading a different versioned pack
    changes parser behavior (ascii@1 has no protect rules, so 'Dr. ' splits)."""
    import os

    ascii_pack = load_pack(
        os.path.join(os.path.dirname(DEFAULT_PACK_PATH), "ascii_v1.json")
    )
    assert ascii_pack.identity == "ascii@1"
    df = spark.createDataFrame(
        [("c0", 0, "user", "Dr. Smith works here. Water is wet.", None)],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.lit("2025-01-01 00:00:00").cast("timestamp"))
    default_claims = [r["claim"] for r in parse_turns(df).orderBy("claim_idx").collect()]
    ascii_claims = [
        r["claim"] for r in parse_turns(df, ascii_pack).orderBy("claim_idx").collect()
    ]
    assert default_claims == ["Dr. Smith works here.", "Water is wet."]
    assert ascii_claims == ["Dr.", "Smith works here.", "Water is wet."]
    # both packs keep the tiling invariant
    assert span_reconstruction(parse_turns(df, ascii_pack)).filter(~F.col("spans_ok")).count() == 0


def test_long_turn_no_quadratic_cliff(spark):
    """The span prefix-sum is a single fold (O(n) per turn). A 2k-sentence turn
    must parse in the same ballpark as many short turns — the previous
    aggregate-over-slice formulation was O(n^2) and visibly cliffed here."""
    sent = "The quick brown fox jumps over the lazy dog number %d. "
    long_text = "".join(sent % i for i in range(2000)).strip()
    df = spark.createDataFrame(
        [("c0", 0, "user", long_text, None)],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.lit("2025-01-01 00:00:00").cast("timestamp"))
    t0 = time.perf_counter()
    recs = parse_turns(df)
    n = recs.count()
    elapsed = time.perf_counter() - t0
    assert n == 2000
    assert span_reconstruction(recs).filter(~F.col("spans_ok")).count() == 0
    assert elapsed < 20, f"long-turn parse took {elapsed:.1f}s — quadratic cliff?"


def test_split_preserves_every_char(spark):
    """The raw segments concatenate back to the text with no separator —
    the property the span arithmetic is built on."""
    df = transcripts_df(spark, N).filter(~F.col("text").rlike("^CALL "))
    joined = df.select(
        (F.array_join(split_sentences(F.col("text")), "") == F.col("text")).alias("ok")
    )
    assert joined.filter(~F.col("ok")).count() == 0


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
