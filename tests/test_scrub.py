"""PII scrub stage (operators/scrub.py) — pipeline-integration invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from openfactverification_spark.operators import scrub as scrub_ops
from openfactverification_spark.plans.pipeline import build_pipeline
from openfactverification_spark.sources.transcripts import transcripts_df

N = 400


def test_scrub_is_noop_on_clean_text(spark):
    """The synthetic corpus contains no PII; scrub_pii must not alter it."""
    base = transcripts_df(spark, N)
    diff = (
        base.alias("a")
        .join(scrub_ops.scrub_pii(base).alias("b"), ["conv_id", "turn_idx"])
        .filter(F.col("a.text") != F.col("b.text"))
        .count()
    )
    assert diff == 0


def test_seeded_pii_fully_redacted_no_leaks(spark):
    """After seed_and_scrub, no raw email/phone/IPv4 survives anywhere in the
    routed records, and placeholders exist (the seeding actually happened)."""
    routed = build_pipeline(spark, scrub_ops.seed_and_scrub(transcripts_df(spark, N))).routed
    agg = routed.agg(
        F.sum(scrub_ops.pii_leak_predicate().cast("int")).alias("leaks"),
        F.sum(scrub_ops.placeholder_predicate().cast("int")).alias("redacted"),
    ).first()
    assert agg["leaks"] == 0
    assert agg["redacted"] > 0


def test_unseeded_raw_text_does_leak(spark):
    """Counter-test: skipping the scrub on seeded text leaves raw PII in the
    routed records — proves the leak predicate detects what scrub removes."""
    d = scrub_ops.D("spark")
    seeded = transcripts_df(spark, N).withColumn(
        "text", F.expr(scrub_ops.seeded_text_expr(d))
    )
    routed = build_pipeline(spark, seeded).routed
    leaks = routed.filter(scrub_ops.pii_leak_predicate()).count()
    assert leaks > 0


def test_scrub_spans_still_tile(spark):
    """Scrubbed text must still satisfy the P3 gap-free span contract."""
    from openfactverification_spark.operators import parse as parse_ops

    records = parse_ops.parse_turns(scrub_ops.seed_and_scrub(transcripts_df(spark, N)))
    bad = parse_ops.span_reconstruction(records).filter(~F.col("spans_ok")).count()
    assert bad == 0
