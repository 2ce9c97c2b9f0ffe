"""Bucketed staging tables — the co-located-join scale path (P3/S8).

At 100 TB the dominant recurring cost is re-shuffling the big fact
tables on the same join key query after query. Writing the staging
tables bucketed by that key (`bucketBy(n, key)` + `sortBy(key)`)
makes every later equi-join / groupBy on the key shuffle-free: both
sides arrive pre-partitioned, and Spark plans a SortMergeJoin with no
Exchange (verified by tests/test_bucketed.py against the plan).

Bucketed output requires the session catalog (`saveAsTable`), which
is how a real deployment stages anyway (warehouse on the object
store). Pick n_buckets so each bucket is ~128 MB-1 GB at target
scale; bucket counts must match across tables joined together.
"""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401  (kept for callers)
from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   n_buckets: int = 32,
                   mode: str = "overwrite") -> None:
    """Stage `df` as a catalog table bucketed+sorted by `key`."""
    (df.write.mode(mode)
       .bucketBy(n_buckets, key)
       .sortBy(key)
       .format("parquet")
       .saveAsTable(table_name))


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def cojoin_bucketed(spark: SparkSession, left_table: str,
                    right_table: str, key: str,
                    how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts this plans with zero Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
