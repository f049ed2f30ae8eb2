"""R-stage: tag-driven router fanning records out to per-category sinks
(SURVEY.md §2.7 U5 — the reference's implicit checkworthy / non-factual /
tool-trace / verdict split at /root/reference/factcheck/__init__.py:171-195).

The route tag is a single `when` chain computed in one pass; sinks are then either
(a) one partitioned write with `partitionBy('route')` — single job, no re-read — or
(b) persist + four filtered writes when sinks need different schemas/layouts.
Routes partition the record set: disjoint and complete (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SINKS = ("tool_trace", "non_factual", "checkworthy", "verdict")


def route_records(enriched: DataFrame) -> DataFrame:
    """Adds the `route` tag:
      tool_trace   — parsed tool invocations
      non_factual  — claims classified not checkworthy (NOTHING_TO_CHECK)
      verdict      — checkworthy claims with a stance score (SCORE)
      checkworthy  — checkworthy claims still awaiting evidence (NO_EVIDENCE)
    """
    return enriched.withColumn(
        "route",
        F.when(F.col("record_kind") == "tool_call", F.lit("tool_trace"))
        .when(~F.col("checkworthy"), F.lit("non_factual"))
        .when(F.col("factuality_tag") == "SCORE", F.lit("verdict"))
        .otherwise(F.lit("checkworthy")),
    )


def sink(routed: DataFrame, name: str) -> DataFrame:
    assert name in SINKS, name
    return routed.filter(F.col("route") == name)


def write_sinks(
    routed: DataFrame, out_dir: str, fmt: str = "parquet", files_per_partition: int = 8
) -> None:
    """Single-pass multi-sink write: partitioned by (route, day). On Iceberg this
    becomes `days(ts), bucket(conv_id)` partition transforms; parquet stand-in uses
    explicit day column. One job, no persist, no re-scan.

    The pre-write shuffle is salted with pmod(hash(conv_id), k): a bare
    repartition('route','ts_day') would collapse the write into (#routes × #days)
    shuffle groups — ~20 giant tasks regardless of cluster size — while no
    repartition at all emits (#tasks × #partitions) small files. The salt bounds
    files at k per (route, day) and keeps every executor writing."""
    (
        routed.withColumn("ts_day", F.to_date("ts"))
        .repartition(
            F.col("route"),
            F.col("ts_day"),
            F.pmod(F.hash("conv_id"), F.lit(files_per_partition)),
        )
        .write.mode("overwrite")
        .partitionBy("route", "ts_day")
        .format(fmt)
        .save(out_dir)
    )
