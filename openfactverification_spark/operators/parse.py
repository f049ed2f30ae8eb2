"""P-stage: vectorized regex/grok parse of transcript turns into typed records.

Re-expresses the reference's Decompose stage
(/root/reference/factcheck/core/Decompose.py:19-31 sentence split, :70-138 span
restoration) as pure JVM-side expressions: no Python in the loop, and — unlike a
naive window-based port — **zero shuffle**: claim spans are computed inside the
sentence array *before* exploding, so the whole parse is narrow and pipelines into
whatever follows. At 10^12 rows this is the difference between a map-only stage and
a full-table exchange.

Segmentation is driven by a versioned **rule-pack** (rulepack.py — the
prompt-plugin analog, SURVEY.md §2.9): protect rules guard abbreviations
("Dr. Smith" stays one sentence), boundary rules cover both ASCII terminators
(punctuation + space) and CJK terminators (。！？, no space — the reference's
zh path, /root/reference/script/minimal_test_zh.json + language-aware
nltk.sent_tokenize at Decompose.py:29). Every original character survives in
exactly one raw segment, so spans form a **gap-free monotone partition** of the
turn text — precisely the reference's repaired-span contract
(Decompose.py:92-107: spans concatenate back to the doc).

Record kinds:
  * ``claim``     — one sentence of a non-tool turn; `claim` is the trimmed
                    segment, [span_start, span_end) the raw segment's char span.
  * ``tool_call`` — a grok-parsed `CALL tool(q="...") -> status` invocation
                    (the telemetry analog of the reference's tool/evidence trace).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..rulepack import SEP, SP, DEFAULT_PACK, RulePack

# Module-level constants = the default pack's values (kept for importers; the
# single source of truth is rulepacks/default.json).
TOOL_CALL_RE = DEFAULT_PACK.tool_call_pattern
OPINION_RE = DEFAULT_PACK.opinion_pattern
VAGUE_RE = DEFAULT_PACK.vague_pattern
MIN_SENT_LEN = DEFAULT_PACK.min_sent_len  # F1: Decompose.py:30

# Single-pass span computation over the pre-split raw segments: one left fold
# accumulates (segments-with-start-offsets, running length); the finisher
# attaches claim_idx and span_end. O(n) length() calls per turn — the previous
# formulation (aggregate over slice(sents, 1, i) inside transform) re-scanned
# every prefix, O(n^2) in sentences per turn, a cliff on 10k-sentence documents.
# No window, no shuffle: spans exist before the explode.
_SPANS_EXPR = """
aggregate(
  sents,
  struct(cast(array() as array<struct<seg:string,st:int>>) AS arr, 0 AS acc),
  (a, x) -> struct(array_append(a.arr, struct(x AS seg, a.acc AS st)) AS arr,
                   a.acc + length(x) AS acc),
  a -> transform(a.arr, (p, i) -> struct(
         trim(p.seg) AS claim,
         i AS claim_idx,
         p.st AS span_start,
         p.st + length(p.seg) AS span_end)))
"""


def split_sentences(text: Column, pack: RulePack = DEFAULT_PACK) -> Column:
    """array<string> of RAW sentence segments (concatenate back to `text`).

    Protect rules (length-preserving, \\x02 sentinel) run before boundary rules
    (\\x01 sentinel inserted after the terminator, no char dropped). The \\x02
    sentinel only needs to exist DURING the boundary pass, so it is restored
    with one whole-text literal replace before the split — cheaper than a
    per-segment lambda after it.
    """
    s = text
    for r in pack.protect_rules + pack.boundary_rules:
        s = F.regexp_replace(s, r.pattern, pack.spark_replacement(r.replacement))
    if pack.protect_rules:
        s = F.replace(s, F.lit(SP), F.lit(" "))
    return F.split(s, SEP)


def parse_turns(transcripts: DataFrame, pack: RulePack = DEFAULT_PACK) -> DataFrame:
    """transcripts -> parsed records (claims + tool calls), shuffle-free and
    **single-scan**: one projection computes the sentence array, one Generate
    explodes it, and tool turns ride the same explode as a 1-element array. A
    two-branch `filter ∪ filter` plan would scan the source table twice — at
    100 TB that doubles the IO bill for zero benefit.

    The sentence split is hoisted into its own column first: lambda bodies get no
    common-subexpression elimination, so referencing the regex split inside
    `transform`/`aggregate` would re-run it per array element.

    Output columns: conv_id, turn_idx, role, ts, text, record_kind, claim_idx,
    claim, span_start, span_end, tool_name, tool_query, tool_status.
    """
    tool_re = pack.tool_call_pattern
    is_tool = F.col("text").rlike(tool_re)

    spans = F.expr(_SPANS_EXPR)
    tool_span = F.array(
        F.struct(
            F.col("text").alias("claim"),
            F.lit(0).alias("claim_idx"),
            F.lit(None).cast("int").alias("span_start"),
            F.lit(None).cast("int").alias("span_end"),
        )
    )

    base = (
        transcripts.withColumn(
            "record_kind", F.when(is_tool, F.lit("tool_call")).otherwise(F.lit("claim"))
        )
        .withColumn(
            "sents",
            F.when(F.col("record_kind") == "claim", split_sentences(F.col("text"), pack)),
        )
        .withColumn("span", F.explode(F.when(F.col("record_kind") == "claim", spans).otherwise(tool_span)))
    )

    is_claim = F.col("record_kind") == "claim"
    return base.select(
        "conv_id",
        "turn_idx",
        "role",
        "ts",
        "text",
        "record_kind",
        F.when(is_claim, F.col("span.claim_idx")).otherwise(F.lit(0)).alias("claim_idx"),
        F.when(is_claim, F.col("span.claim")).alias("claim"),
        F.when(is_claim, F.col("span.span_start")).alias("span_start"),
        F.when(is_claim, F.col("span.span_end")).alias("span_end"),
        F.when(~is_claim, F.regexp_extract("text", tool_re, 1)).alias("tool_name"),
        F.when(~is_claim, F.regexp_extract("text", tool_re, 2)).alias("tool_query"),
        F.when(~is_claim, F.regexp_extract("text", tool_re, 3)).alias("tool_status"),
    ).filter(~is_claim | (F.length(F.trim(F.col("claim"))) >= pack.min_sent_len))  # F1


def span_reconstruction(records: DataFrame) -> DataFrame:
    """P3 invariant check: per claim turn, the spans must be a gap-free
    partition of the text ([0, len) tiled exactly) and each claim must equal
    the trimmed span slice (Decompose.py:92-107 contract). Returns per-turn
    rows with a boolean `spans_ok`.

    Note: sentences the F1 length filter dropped (e.g. the zero-width segment
    after a text-final CJK terminator) are zero-width or absent; the tiling
    sum tolerates only zero-width gaps, which is the contract's intent."""
    claim_ok = F.col("claim") == F.trim(
        F.expr("substring(text, span_start + 1, span_end - span_start)")
    )
    return (
        records.filter(F.col("record_kind") == "claim")
        .groupBy("conv_id", "turn_idx", "text")
        .agg(
            F.min("span_start").alias("mn"),
            F.max("span_end").alias("mx"),
            F.sum(F.col("span_end") - F.col("span_start")).alias("covered"),
            F.bool_and(claim_ok).alias("claims_ok"),
        )
        .select(
            "conv_id",
            "turn_idx",
            (
                (F.col("mn") == 0)
                & (F.col("mx") == F.length("text"))
                & (F.col("covered") == F.length("text"))
                & F.col("claims_ok")
            ).alias("spans_ok"),
        )
    )


def checkworthy_fallback(claim_norm: Column, pack: RulePack = DEFAULT_PACK) -> Column:
    """Rule-based checkworthiness for claims missing from the label dictionary."""
    return ~(claim_norm.rlike(pack.opinion_pattern) | claim_norm.rlike(pack.vague_pattern)) & (
        F.length(F.trim(claim_norm)) >= pack.min_sent_len
    )
