"""Unit lock on scripts/sp_exchange_audit.sp_rows_of: the metric
reader must count exactly the rows flowing through SinglePartition
shuffle exchanges in the executed plan — the detector for data-scaled
global windows/sorts (the r13 customer_rfm_segments class)."""

from __future__ import annotations

import importlib.util
import pathlib
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _audit_mod():
    spec = importlib.util.spec_from_file_location(
        "_sp_audit_for_test", ROOT / "scripts" / "sp_exchange_audit.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_sp_audit_for_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_counts_global_window_rows(spark):
    mod = _audit_mod()
    df = (spark.range(1234).withColumn("v", F.col("id") % 7)
          .withColumn("r", F.row_number().over(
              Window.orderBy("v", "id"))))
    df.collect()
    assert mod.sp_rows_of(df) == 1234


def test_partitioned_window_counts_zero(spark):
    mod = _audit_mod()
    df = (spark.range(1234).withColumn("v", F.col("id") % 7)
          .withColumn("r", F.row_number().over(
              Window.partitionBy("v").orderBy("id"))))
    df.collect()
    assert mod.sp_rows_of(df) == 0


def test_global_rank_operator_counts_only_offsets(spark):
    """The distributed rank's one global window is the bounded
    offsets frame — sp rows must equal num_partitions, not the data
    size (this is exactly what separates it from a global NTILE)."""
    from iq_to_hdl_migration_spark.operators.ranking import global_rank

    mod = _audit_mod()
    df = spark.range(5000).withColumn("v", F.col("id") % 11)
    got = global_rank(df, [F.desc("v"), F.asc("id")], rank_col="r",
                      num_partitions=8)
    got.collect()
    assert mod.sp_rows_of(got) <= 8
