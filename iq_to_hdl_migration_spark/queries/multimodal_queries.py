"""Registered multimodal queries over `documents`-as-binary (brief:
multimodal columns). Hash-checked: the pandas-UDF pipeline's sha256 /
chunking is reproduced in the DuckDB oracle over the same UTF-8 bytes,
so the mapInPandas plumbing itself is value-verified end-to-end.
"""

from __future__ import annotations

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
