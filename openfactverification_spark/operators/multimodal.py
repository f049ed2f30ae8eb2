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


# --------------------------------------------------------------------------------------
# Frame sampling + resize (video-shaped payloads)
# --------------------------------------------------------------------------------------

N_FRAMES = 4  # frames per synthetic video payload
FRAME_BYTES = 16  # one md5 digest per frame
FRAME_STEP = 2  # sample every 2nd frame
RESIZE_STRIDE = 2  # "resize" = keep every 2nd byte of a frame

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_first_byte", T.IntegerType(), False),
        T.StructField("frame_sum_mod", T.IntegerType(), False),
        T.StructField("resized_bytes", T.IntegerType(), False),
        T.StructField("resized_sum_mod", T.IntegerType(), False),
    ]
)


def video_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> synthetic video table: (doc_id, payload binary) where the
    payload is N_FRAMES fixed-size frames laid out contiguously (frame k =
    unhex(md5(text || '#k')) — deterministic stand-in for encoded frames)."""
    frames = [
        F.unhex(F.md5(F.concat(F.col("text"), F.lit(f"#{k}")))) for k in range(N_FRAMES)
    ]
    return spark.read.parquet(table_path(sf_dir, "documents")).select(
        "doc_id", F.concat(*frames).alias("payload")
    )


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for frame-sample + resize: slice every FRAME_STEP-th
    fixed-size frame out of the contiguous payload (1 row -> N rows, the
    explode-shaped UDF), then 'resize' each frame by striding its bytes —
    the real implementation would ffmpeg-seek and PIL-resize here; the byte
    layout, batch shape, and 1->N fan-out are the production plumbing."""
    sampled = range(0, N_FRAMES, FRAME_STEP)
    for pdf in batches:
        out: dict[str, list] = {f.name: [] for f in FRAME_SCHEMA.fields}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            for k in sampled:
                frame = payload[k * FRAME_BYTES : (k + 1) * FRAME_BYTES]
                resized = frame[::RESIZE_STRIDE]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(k)
                out["frame_first_byte"].append(frame[0])
                out["frame_sum_mod"].append(sum(frame) % 256)
                out["resized_bytes"].append(len(resized))
                out["resized_sum_mod"].append(sum(resized) % 256)
        yield pd.DataFrame(out)


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered query: frame-sample + resize through mapInPandas."""
    return video_records(spark, sf_dir).mapInPandas(sample_frames, FRAME_SCHEMA)


def multimodal_frames_oracle() -> str:
    """DuckDB oracle: per sampled frame, recompute the stats from the frame's
    md5 hex directly (frame k = md5(text || '#k'); resize keeps even-offset
    bytes, i.e. every other hex pair)."""
    fhex = "md5(text || '#' || k)"
    byte_i = f"('0x' || substr({fhex}, 1 + i * 2, 2))::INT"
    frames = ", ".join(str(k) for k in range(0, N_FRAMES, FRAME_STEP))
    n_resized = (FRAME_BYTES + RESIZE_STRIDE - 1) // RESIZE_STRIDE
    return f"""
SELECT doc_id,
       CAST(k AS INT) AS frame_idx,
       ('0x' || substr({fhex}, 1, 2))::INT AS frame_first_byte,
       (list_sum(list_transform(range(0, {FRAME_BYTES}), i -> {byte_i})) % 256)::INT
         AS frame_sum_mod,
       {n_resized} AS resized_bytes,
       (list_sum(list_transform(range(0, {FRAME_BYTES}), i ->
          CASE WHEN i % {RESIZE_STRIDE} = 0 THEN {byte_i} ELSE 0 END)) % 256)::INT
         AS resized_sum_mod
FROM documents, (SELECT unnest([{frames}]) AS k) f"""
