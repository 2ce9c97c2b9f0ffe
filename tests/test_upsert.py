"""MERGE/upsert: updated keys replaced, new keys inserted, only the
touched partitions rewritten, everything else byte-identical."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from iq_to_hdl_migration_spark.operators.upsert import merge_upsert
from iq_to_hdl_migration_spark.sources.tables import load_table


def _file_state(path):
    return {f: (os.path.getsize(f), os.path.getmtime(f))
            for f in glob.glob(f"{path}/day=*/*.parquet")}


def _write(ev, path):
    (ev.withColumn("day", F.to_date("ts"))
       .write.mode("overwrite").partitionBy("day").parquet(path))


def test_merge_upsert_updates_inserts_and_preserves(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "tbl")
    _write(ev, path)
    before = spark.read.parquet(path)
    n_before = before.count()

    # pick one existing day: update 5 rows' value, insert 3 new keys
    some_day = before.select("day").orderBy("day").first()[0]
    day_rows = before.filter(F.col("day") == some_day)
    upd = (day_rows.orderBy("event_id").limit(5)
           .withColumn("value", F.lit(12345.0)))
    max_id = before.agg(F.max("event_id")).first()[0]
    ins = (day_rows.orderBy("event_id").limit(3)
           .withColumn("event_id", F.col("event_id") + F.lit(max_id + 10)))
    updates = upd.unionByName(ins).localCheckpoint()  # sever lineage to
    upd_ids = [r["event_id"] for r in upd.collect()]  # pre-merge files

    state_before = _file_state(path)
    n_rewritten = merge_upsert(spark, path, updates, ["event_id"])
    assert n_rewritten == 1

    after = spark.read.parquet(path)
    assert after.count() == n_before + 3                       # inserts
    got = after.filter(F.col("event_id").isin(upd_ids))
    assert got.count() == 5
    assert all(r["value"] == 12345.0 for r in got.collect())   # updates
    # exactly one partition rewritten; all others byte-identical
    state_after = _file_state(path)
    changed_days = set()
    for f, st in state_before.items():
        if state_after.get(f) != st:
            changed_days.add(f.split("day=")[1].split("/")[0])
    for f in state_after:
        if f not in state_before:
            changed_days.add(f.split("day=")[1].split("/")[0])
    assert changed_days == {str(some_day)}


def test_merge_upsert_is_idempotent(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "tbl2")
    _write(ev, path)
    day = spark.read.parquet(path).select("day").orderBy("day").first()[0]
    upd = (spark.read.parquet(path).filter(F.col("day") == day)
           .orderBy("event_id").limit(4)
           .withColumn("value", F.lit(99.0))).localCheckpoint()
    merge_upsert(spark, path, upd, ["event_id"])
    n1 = spark.read.parquet(path).count()
    s1 = spark.read.parquet(path).agg(
        F.sum(F.col("value").cast("decimal(18,2)"))).first()[0]
    merge_upsert(spark, path, upd, ["event_id"])               # re-apply
    assert spark.read.parquet(path).count() == n1
    assert spark.read.parquet(path).agg(
        F.sum(F.col("value").cast("decimal(18,2)"))).first()[0] == s1
