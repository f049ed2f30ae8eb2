"""Skew handling for mega-conversations: salted two-phase windowing.

North-rule obligation (SURVEY.md §4 custom-work item 1). AQE's skew-join
splitting covers joins, but `Window.partitionBy(conv_id).orderBy(turn_idx)`
sends every row of a conversation to ONE task — a single 10^9-turn
mega-conversation serializes the whole stage. The classic fix is a two-phase
scan:

  phase 1: partition by (conv_id, block) where block = turn_idx div B — local
           window inside each bounded block (B rows max per task);
  phase 2: per-block totals (one row per block — tiny) get a prefix-sum window
           over blocks within the conversation, giving each block its offset;
           a broadcast-sized join adds the offset back.

The result is bit-identical to the naive single-partition window (tested), but
the big-data stages now key on (conv_id, block): bounded partitions, no
straggler. The per-block frame is small by construction (#blocks =
conv_len / B), so phase 2's window is never skewed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_BLOCK = 100_000  # rows per salt block; bounds any task's window state


def running_claim_count_naive(records: DataFrame) -> DataFrame:
    """Per (conv_id, turn_idx) running total of claim records up to and
    including the turn — the straight window formulation (skew-prone)."""
    per_turn = records.groupBy("conv_id", "turn_idx").agg(
        F.sum((F.col("record_kind") == "claim").cast("long")).alias("n_turn_claims")
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_turn.withColumn("running_claims", F.sum("n_turn_claims").over(w)).select(
        "conv_id", "turn_idx", "n_turn_claims", "running_claims"
    )


def running_claim_count_salted(records: DataFrame, block: int = DEFAULT_BLOCK) -> DataFrame:
    """Identical result via the two-phase salted scan — mega-conversation safe."""
    per_turn = records.groupBy("conv_id", "turn_idx").agg(
        F.sum((F.col("record_kind") == "claim").cast("long")).alias("n_turn_claims")
    ).withColumn("blk", (F.col("turn_idx") / F.lit(block)).cast("long"))

    # Phase 1: local running sum inside each (conv_id, block) — bounded state.
    w_local = (
        Window.partitionBy("conv_id", "blk")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = per_turn.withColumn("local_run", F.sum("n_turn_claims").over(w_local))

    # Phase 2: per-block totals (tiny frame), exclusive prefix over blocks.
    w_blocks = (
        Window.partitionBy("conv_id")
        .orderBy("blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        per_turn.groupBy("conv_id", "blk")
        .agg(F.sum("n_turn_claims").alias("blk_total"))
        .withColumn("blk_offset", F.coalesce(F.sum("blk_total").over(w_blocks), F.lit(0)))
        .select("conv_id", "blk", "blk_offset")
    )

    return (
        local.join(offsets, ["conv_id", "blk"])
        .withColumn("running_claims", F.col("local_run") + F.col("blk_offset"))
        .select("conv_id", "turn_idx", "n_turn_claims", "running_claims")
    )


def repartition_salted(df: DataFrame, buckets: int = 32) -> DataFrame:
    """Spread a conv_id-keyed frame across (conv_id, salt) partitions for
    downstream per-conv work that tolerates intra-conv splitting (e.g. the sink
    write)."""
    return df.repartition(F.col("conv_id"), F.pmod(F.hash("turn_idx"), F.lit(buckets)))
