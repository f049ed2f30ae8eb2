"""Property-based parser invariants (hypothesis): the rule-pack splitter must
preserve every character and tile spans gap-free for ARBITRARY text, not just
the corpus — randomized inputs cover boundary pile-ups (".. ", "。。", mixed
terminators, sentinel-adjacent abbreviations) that fixtures miss.

Driver-side evaluation: the invariants are pure functions of the pack, so we
evaluate the same Spark Columns via a one-row DataFrame per batch of generated
texts (one Spark job per property run, not per example).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from openfactverification_spark.operators.parse import parse_turns, span_reconstruction
from openfactverification_spark.rulepack import DEFAULT_PACK
from openfactverification_spark.operators.parse import split_sentences

# Alphabet exercising every rule class: ASCII words, terminators with/without
# spaces, CJK terminators/chars, abbreviations, multi-space runs.
_CHUNKS = st.sampled_from(
    [
        "word",
        "Dr. ",
        "e.g. ",
        "x",
        ". ",
        "! ",
        "? ",
        ".",
        "。",
        "！",
        "？",
        " ",
        "  ",
        "天",
        "气很好",
        "Mr. Smith",
        "end.",
    ]
)
_TEXTS = st.lists(_CHUNKS, min_size=1, max_size=12).map("".join).filter(str.strip)


def _batch_df(spark, texts):
    rows = [("c0", i, "user", t, None) for i, t in enumerate(texts)]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.lit("2025-01-01 00:00:00").cast("timestamp"))


@settings(max_examples=10, deadline=None)
@given(st.lists(_TEXTS, min_size=5, max_size=30))
def test_split_preserves_chars_on_arbitrary_text(spark, texts):
    df = _batch_df(spark, texts)
    bad = df.select(
        (F.array_join(split_sentences(F.col("text")), "") == F.col("text")).alias("ok")
    ).filter("NOT ok")
    assert bad.count() == 0


@settings(max_examples=6, deadline=None)
@given(st.lists(_TEXTS, min_size=5, max_size=20))
def test_spans_tile_on_arbitrary_text(spark, texts):
    """Spans of surviving claims cover [0, len) minus only the segments the F1
    length filter dropped; every span slice trims to its claim. (Full gap-free
    tiling holds only when no segment is dropped, so assert the per-row slice
    property plus monotone non-overlap.)"""
    recs = parse_turns(_batch_df(spark, texts)).filter(F.col("record_kind") == "claim")
    bad_slice = recs.filter(
        F.expr("trim(substring(text, span_start + 1, span_end - span_start)) <> claim")
    ).count()
    assert bad_slice == 0
    # monotone non-overlap within each turn
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id", "turn_idx").orderBy("claim_idx")
    overlaps = (
        recs.withColumn("prev_end", F.lag("span_end").over(w))
        .filter("prev_end IS NOT NULL AND span_start < prev_end")
        .count()
    )
    assert overlaps == 0


@settings(max_examples=6, deadline=None)
@given(st.lists(st.sampled_from(["word ", "two words. ", "地球绕太阳转。", "Dr. Who. "]), min_size=3, max_size=10).map("".join))
def test_clean_corpus_tiles_gap_free(spark, text):
    """On texts whose sentences all pass the F1 filter, the FULL gap-free
    tiling invariant (span_reconstruction) must hold."""
    recs = parse_turns(_batch_df(spark, [text]))
    assert span_reconstruction(recs).filter("NOT spans_ok").count() == 0
