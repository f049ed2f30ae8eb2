"""Format adapter: parquet fallback path is fully exercised (Iceberg path needs
a catalog jar this container lacks — target-kind dispatch is still tested)."""

from __future__ import annotations

from pyspark.sql import functions as F

from openfactverification_spark.plans.pipeline import build_pipeline
from openfactverification_spark.sources import catalog
from openfactverification_spark.sources.transcripts import transcripts_df


def test_target_kind_dispatch():
    assert catalog.is_table_name("cat.db.transcripts")
    assert catalog.is_table_name("db.transcripts")
    # bare tokens and anything path-like are paths, not tables
    assert not catalog.is_table_name("transcripts")
    assert not catalog.is_table_name("out")
    assert not catalog.is_table_name("/tmp/x")
    assert not catalog.is_table_name("s3://bucket/x")
    assert not catalog.is_table_name("dir/file.parquet")


def test_parquet_roundtrip_and_lineage_fallback(spark, tmp_path):
    src = str(tmp_path / "in")
    transcripts_df(spark, 500).write.parquet(src)
    t = catalog.read_transcripts(spark, src)
    routed = build_pipeline(spark, t).routed

    out = str(tmp_path / "sinks")
    catalog.write_routed(routed, out)
    back = spark.read.parquet(out)
    assert back.count() == routed.count()
    assert {r["route"] for r in back.select("route").distinct().collect()} == {
        "checkworthy",
        "non_factual",
        "tool_trace",
        "verdict",
    }
    assert catalog.current_lineage(spark, out, fallback="fp-123") == "fp-123"
