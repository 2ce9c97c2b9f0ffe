"""Incremental rollup maintenance: delta merges must equal a full
recompute, touch only the delta's partitions, and history must not be
rewritten."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from iq_to_hdl_migration_spark.operators.incremental import (
    daily_rollup, init_rollup, merge_delta)
from iq_to_hdl_migration_spark.sources.tables import load_table


def _rows(df):
    return sorted((str(r["day"]), r["event_type"], r["n_events"],
                   str(r["total_value"])) for r in df.collect())


def test_merge_equals_full_recompute(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    cutoff = "2024-01-15"
    phase1 = ev.filter(F.to_date("ts") < cutoff)
    phase2 = ev.filter(F.to_date("ts") >= cutoff)

    path = str(tmp_path / "rollup")
    init_rollup(phase1, path)
    merge_delta(spark, path, phase2)

    got = _rows(spark.read.parquet(path))
    want = _rows(daily_rollup(ev))
    assert got == want


def test_merge_touches_only_delta_partitions(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "rollup2")
    init_rollup(ev.filter(F.to_date("ts") < "2024-01-20"), path)

    before = {d: os.path.getmtime(d)
              for d in glob.glob(f"{path}/day=*")}
    # delta entirely inside one existing day + one new day
    delta = ev.filter(F.to_date("ts").isin(["2024-01-05", "2024-01-25"]))
    merge_delta(spark, path, delta)

    after = {d: os.path.getmtime(d) for d in glob.glob(f"{path}/day=*")}
    touched = {os.path.basename(d) for d in after
               if d not in before or after[d] != before[d]}
    assert touched == {"day=2024-01-05", "day=2024-01-25"}, touched
    # untouched history partitions byte-identical mtimes
    untouched = set(before) - {f"{path}/day=2024-01-05"}
    assert all(after[d] == before[d] for d in untouched)


def test_double_counting_on_remerge_is_visible(spark, sf_dir, tmp_path):
    """Re-merging the same delta double-counts (merge is additive, not
    idempotent) — the ledger/dedup layer upstream is what guards
    replays; this test documents the contract."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "rollup3")
    day = "2024-01-03"
    init_rollup(ev.filter(F.to_date("ts") < "2024-01-10"), path)
    delta = ev.filter(F.to_date("ts") == day)
    n_before = (spark.read.parquet(path)
                .filter(F.col("day") == day)
                .agg(F.sum("n_events")).collect()[0][0])
    merge_delta(spark, path, delta)
    n_after = (spark.read.parquet(path)
               .filter(F.col("day") == day)
               .agg(F.sum("n_events")).collect()[0][0])
    assert n_after == 2 * n_before
