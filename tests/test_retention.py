"""Right-to-be-forgotten: erasure must remove exactly the requested
users' rows, rewrite only the partitions containing them, and leave
every other partition's files byte-for-byte untouched."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from iq_to_hdl_migration_spark.operators.retention import (
    affected_partitions, forget_users)
from iq_to_hdl_migration_spark.sources.tables import load_table


def _write_partitioned(ev, path):
    (ev.withColumn("day", F.to_date("ts"))
       .write.mode("overwrite").partitionBy("day").parquet(path))


def _file_state(path):
    return {
        f: (os.path.getsize(f), os.path.getmtime(f))
        for f in glob.glob(f"{path}/day=*/*.parquet")
    }


def test_forget_users_erases_and_preserves(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_pt")
    _write_partitioned(ev, path)

    # pick 3 users active on only SOME days, so untouched days exist
    targets = [r["user_id"] for r in
               (spark.read.parquet(path).groupBy("user_id")
                .agg(F.countDistinct("day").alias("d"))
                .orderBy("d", "user_id").limit(3).collect())]
    before = spark.read.parquet(path)
    n_before = before.count()
    n_target = before.filter(F.col("user_id").isin(targets)).count()
    assert n_target > 0

    days = set(str(d) for d in
               affected_partitions(spark, path, targets))
    state_before = _file_state(path)

    n_rewritten = forget_users(spark, path, targets)
    assert n_rewritten == len(days)

    after = spark.read.parquet(path)
    assert after.filter(F.col("user_id").isin(targets)).count() == 0
    assert after.count() == n_before - n_target

    # untouched partitions: identical files, byte sizes and mtimes
    state_after = _file_state(path)
    for f, st in state_before.items():
        day = f.split("day=")[1].split("/")[0]
        if day not in days:
            assert state_after.get(f) == st, f"untouched {f} was rewritten"


def test_forget_users_noop_for_unknown_ids(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_pt2")
    _write_partitioned(ev, path)
    state_before = _file_state(path)
    assert forget_users(spark, path, [10**15, 10**15 + 1]) == 0
    assert _file_state(path) == state_before
