"""The mm_audio_vad_segments oracle enumerates chunk indexes 0..63
(documents <= 2048 bytes) and slices with substr (byte == char only
for ASCII). Those are generator properties, not operator properties —
the query enforces them in-plan with raise_error so a generator
change fails LOUDLY instead of silently hash-red at the driver
(round-7 ADVICE item). This locks both directions: clean corpus
passes, violating corpus raises."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iq_to_hdl_migration_spark.queries import load_all
from iq_to_hdl_migration_spark.sources.tables import load_table

REGISTRY = load_all()


def _doctored_sf_dir(spark, sf_dir, tmp_path, mutate):
    """Copy the documents table into a throwaway sf_dir layout with one
    row's text rewritten by `mutate` (a Column expression)."""
    docs = load_table(spark, sf_dir, "documents")
    first_id = docs.agg(F.min("doc_id")).first()[0]
    doctored = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == first_id, mutate)
        .otherwise(F.col("text")))
    out = os.path.join(str(tmp_path), "documents.parquet")
    doctored.write.parquet(out)
    return str(tmp_path)


def test_vad_guard_rejects_overlong_text(spark, sf_dir, tmp_path):
    bad_dir = _doctored_sf_dir(
        spark, sf_dir, tmp_path, F.lit("x" * 3000))
    df = REGISTRY["mm_audio_vad_segments"].fn(spark, bad_dir)
    with pytest.raises(Exception, match="ASCII text <= 2048"):
        df.count()


def test_vad_guard_rejects_non_ascii_text(spark, sf_dir, tmp_path):
    bad_dir = _doctored_sf_dir(
        spark, sf_dir, tmp_path, F.lit("café au lait"))
    df = REGISTRY["mm_audio_vad_segments"].fn(spark, bad_dir)
    with pytest.raises(Exception, match="ASCII text <= 2048"):
        df.count()


def test_vad_guard_passes_clean_corpus(spark, sf_dir):
    # the real generator satisfies both assumptions — guard is a no-op
    assert REGISTRY["mm_audio_vad_segments"].fn(spark, sf_dir).count() > 0
