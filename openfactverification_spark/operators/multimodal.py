"""Multimodal column plumbing: opaque binary payloads + typed metadata, processed
with Arrow-batched `mapInPandas`.

The real decode step (image/audio libs) is STUBBED — this container has no codec
libraries — but the Spark-side plumbing is real and tested: binary column schema,
Arrow batch transfer into pandas, per-batch vectorized processing, stable output
schema. Swap `_decode_stub` for PIL/librosa calls on a real cluster and nothing
else changes.

For the driver correctness check, the payload is a deterministic 16-byte blob
(unhex(md5(text))) so a pure-SQL DuckDB oracle can verify the byte-level results
the pandas stage computes from the actual binary values.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import table_path

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("first_byte", T.IntegerType(), False),
        T.StructField("byte_sum_mod", T.IntegerType(), False),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real decode is out of scope for this container (no PIL/ffmpeg).

    Plumbing contract: takes the raw binary payload of one media object, returns
    a decoded array. At deployment, implement with the codec of `media_type`.
    """
    raise NotImplementedError("media codecs not available in this environment")


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode+feature-extract: byte stats."""
    return len(payload), payload[0], sum(payload) % 256


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one Arrow batch of (doc_id, media_type, payload) in,
    one batch of features out. Vectorized per batch; zero per-row Python crossing
    the JVM boundary."""
    for pdf in batches:
        stats = pdf["payload"].map(_decode_stub)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [s[0] for s in stats],
                "first_byte": [s[1] for s in stats],
                "byte_sum_mod": [s[2] for s in stats],
            }
        )


def media_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> synthetic media table: (doc_id, media_type, payload binary)."""
    return spark.read.parquet(table_path(sf_dir, "documents")).select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "image/png").otherwise("audio/wav").alias(
            "media_type"
        ),
        F.unhex(F.md5("text")).alias("payload"),
    )


def q_multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered query: binary plumbing through mapInPandas."""
    return media_records(spark, sf_dir).mapInPandas(extract_features, FEATURE_SCHEMA)


def multimodal_bytes_oracle() -> str:
    """DuckDB oracle recomputing the byte stats from the md5 hex directly."""
    byte_i = "('0x' || substr(md5(text), 1 + i * 2, 2))::INT"
    return f"""
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
       16 AS n_bytes,
       ('0x' || substr(md5(text), 1, 2))::INT AS first_byte,
       (list_sum(list_transform(range(0, 16), i -> {byte_i})) % 256)::INT AS byte_sum_mod
FROM documents"""
