"""Registered multimodal queries over `documents`-as-binary (brief:
multimodal columns). Hash-checked: the pandas-UDF pipeline's sha256 /
chunking is reproduced in the DuckDB oracle over the same UTF-8 bytes,
so the mapInPandas plumbing itself is value-verified end-to-end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iq_to_hdl_migration_spark.operators import multimodal as mm
from iq_to_hdl_migration_spark.queries import register
from iq_to_hdl_migration_spark.sources.tables import load_table


@register(
    "mm_binary_features",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           'image/fake' AS media_type,
           CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
           sha256(text) AS sha256,
           CAST(64 + (ascii(substr(text, 1, 1)) % 512) AS INTEGER)
               AS fake_width,
           CAST(64 + (octet_length(encode(text)) % 480) AS INTEGER)
               AS fake_height
    FROM documents
    """,
    doc="binary-column feature extraction via Arrow mapInPandas "
        "(decode stubbed with a deterministic fake; plumbing real)",
)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mm.extract_features(mm.attach_binary_payload(docs))


@register(
    "mm_frame_samples",
    oracle="""
    WITH params AS (
        -- documents text is ASCII, so VARCHAR substr == byte slicing
        SELECT doc_id, text AS b,
               CAST(CEIL(length(text) / 4.0) AS INTEGER) AS step
        FROM documents
    ),
    frames AS (
        SELECT doc_id, i AS frame_idx,
               sha256(substr(b, 1 + i * step, step)) AS frame_sha256,
               length(substr(b, 1 + i * step, step)) AS chunk_len
        FROM params CROSS JOIN (SELECT unnest(range(0, 4)) AS i) t
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(frame_idx AS INTEGER) AS frame_idx, frame_sha256
    FROM frames WHERE chunk_len > 0
    """,
    doc="video-style frame sampling: per-payload chunk fingerprints "
        "(one output row per frame via mapInPandas)",
)
def mm_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mm.frame_sample(mm.attach_binary_payload(docs), n_frames=4)


@register(
    "mm_audio_chunks",
    oracle="""
    SELECT doc_id,
           CAST((n_chars + 1023) // 1024 AS BIGINT) AS n_chunks,
           CAST(n_chars AS BIGINT) AS total_bytes
    FROM documents WHERE doc_id < 200
    """,
    doc="audio-style chunked featurization (fixed 1 KiB chunks over the "
        "binary payload via mapInPandas); the oracle checks the chunk "
        "arithmetic exactly — ceil(n_chars/1024) chunks covering every "
        "byte — since text payload length == n_chars",
)
def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    feats = mm.audio_chunk_features(mm.attach_binary_payload(docs))
    return (feats.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.sum("n_bytes").cast("bigint").alias("total_bytes")))


@register(
    "mm_resize_meta",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(224 AS INTEGER) AS width,
           CAST(224 AS INTEGER) AS height,
           CAST(784 AS BIGINT) AS bytes_per_image
    FROM documents WHERE doc_id < 200
    """,
    doc="binary-in/binary-out resize stub: every output payload is the "
        "fixed 224x224 target (784 stub bytes); oracle checks the "
        "contract a real resampler must satisfy (uniform output shape)",
)
def mm_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    resized = mm.resize_stub(mm.attach_binary_payload(docs))
    return (resized
            .select("width", "height", F.length("payload").alias("blen"))
            .groupBy("width", "height", F.col("blen").alias("bytes_per_image"))
            .agg(F.count(F.lit(1)).alias("n_images"))
            .select("n_images", "width", "height",
                    F.col("bytes_per_image").cast("bigint")))


@register(
    "mm_payload_dedup_groups",
    oracle="""
    WITH h AS (
        SELECT doc_id, sha256(text) AS payload_sha256 FROM documents
    )
    SELECT payload_sha256,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_id
    FROM h
    GROUP BY payload_sha256
    """,
    doc="content-addressed media registry: every payload digest with "
        "its copy count and keeper id — the image/audio twin of text "
        "exact-dedup (hash-groupBy on sha256(payload), one shuffle on "
        "the digest, uniform by construction; n_copies > 1 rows are "
        "the dup groups a multimodal corpus build drops before "
        "perceptual hashing)",
)
def mm_payload_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = mm.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return (docs
            .select("doc_id", F.sha2("payload", 256).alias("payload_sha256"))
            .groupBy("payload_sha256")
            .agg(F.count(F.lit(1)).alias("n_copies"),
                 F.min("doc_id").alias("keeper_id")))
