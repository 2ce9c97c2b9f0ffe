"""Warehouse staging: the one-time ingest that splits unsplittable
single-row-group source files into a scan-parallel layout. Counts and
oracle results must be identical through the staged path."""

from __future__ import annotations

import glob
import os

from iq_to_hdl_migration_spark.queries import load_all
from iq_to_hdl_migration_spark.sources.tables import (
    load_table, stage_warehouse)
from tests.oracle import assert_matches_oracle

REGISTRY = load_all()


def test_stage_and_read_through_warehouse(spark, sf_dir, tmp_path,
                                          monkeypatch):
    wh = str(tmp_path / "wh")
    stage_warehouse(spark, sf_dir, wh,
                    tables=["lineitem", "events", "nation"],
                    rows_per_file=500)
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    li_files = glob.glob(f"{wh}/{sf_name}/lineitem/*.parquet")
    assert len(li_files) > 1  # fact table split for scan parallelism
    raw_count = load_table(spark, sf_dir, "lineitem").count()

    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", wh)
    staged = load_table(spark, sf_dir, "lineitem")
    assert staged.count() == raw_count
    assert any(wh in f for f in staged.inputFiles())

    # events.ts normalization must survive staging (timestamp, not long)
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"].startswith("timestamp")

    # oracle equality holds through the staged layout
    spec = REGISTRY["q1_pricing_summary"]
    assert_matches_oracle(spark, spec.fn, spec.oracle, sf_dir,
                          name="q1_staged")
    spec = REGISTRY["events_hourly_by_type"]
    assert_matches_oracle(spark, spec.fn, spec.oracle, sf_dir,
                          name="events_hourly_staged")


def test_staging_idempotent(spark, sf_dir, tmp_path):
    wh = str(tmp_path / "wh2")
    stage_warehouse(spark, sf_dir, wh, tables=["nation"])
    first = sorted(glob.glob(f"{wh}/**/*.parquet", recursive=True))
    stage_warehouse(spark, sf_dir, wh, tables=["nation"])
    assert sorted(glob.glob(f"{wh}/**/*.parquet", recursive=True)) == first
