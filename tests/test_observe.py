"""A5 metrics: observe() counters must equal the aggregate counts, collected
from the same action (no second pass)."""

from __future__ import annotations

from pyspark.sql import functions as F

from openfactverification_spark.plans.pipeline import build_pipeline, observed_routed
from openfactverification_spark.sources.transcripts import transcripts_df


def test_observed_metrics_match_aggregates(spark):
    routed, obs = observed_routed(transcripts_df(spark, 800), spark)
    routed.write.format("noop").mode("overwrite").save()
    got = obs.get

    expected_df = build_pipeline(spark, transcripts_df(spark, 800)).routed.agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum((F.col("record_kind") == "claim").cast("long")).alias("n_claims"),
        F.sum(F.coalesce(F.col("checkworthy"), F.lit(False)).cast("long")).alias(
            "n_checkworthy"
        ),
        F.sum((F.col("tool_status") == "error").cast("long")).alias("n_tool_errors"),
    )
    expected = expected_df.collect()[0].asDict()
    assert got == expected
