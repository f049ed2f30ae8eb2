"""applyInPandasWithState: state must accumulate across micro-batches and the
final per-conversation totals must equal the batch pipeline's counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from openfactverification_spark.plans.pipeline import build_pipeline
from openfactverification_spark.sources.transcripts import transcripts_df
from openfactverification_spark.streaming import pipeline as spipe
from openfactverification_spark.streaming.stateful import conv_progress

N_TURNS = 1200


def test_stateful_conv_progress_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    # three separate files -> maxFilesPerTrigger=1 yields three micro-batches,
    # so state genuinely carries across batches
    t = transcripts_df(spark, N_TURNS)
    t.filter(F.col("turn_idx") < 3).coalesce(1).write.parquet(src + "/a")
    t.filter((F.col("turn_idx") >= 3) & (F.col("turn_idx") < 6)).coalesce(1).write.parquet(src + "/b")
    t.filter(F.col("turn_idx") >= 6).coalesce(1).write.parquet(src + "/c")
    schema = spark.read.parquet(src + "/a").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )

    routed = spipe.stream_routed(spark, stream)
    q = (
        conv_progress(routed)
        .writeStream.format("memory")
        .queryName("conv_progress")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # memory sink in update mode appends rows; keep the max (totals are monotone)
    emitted = spark.table("conv_progress")
    agg = {}
    for r in emitted.collect():
        cur = agg.get(r["conv_id"], (0, 0, 0))
        agg[r["conv_id"]] = max(cur, (r["n_records"], r["n_claims"], r["n_checkworthy"]))

    batch = (
        build_pipeline(spark, transcripts_df(spark, N_TURNS))
        .routed.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum((F.col("record_kind") == "claim").cast("long")).alias("n_claims"),
            F.sum(
                ((F.col("record_kind") == "claim") & F.col("checkworthy")).cast("long")
            ).alias("n_checkworthy"),
        )
    )
    expected = {
        r["conv_id"]: (r["n_records"], r["n_claims"], r["n_checkworthy"])
        for r in batch.collect()
    }
    assert agg == expected
