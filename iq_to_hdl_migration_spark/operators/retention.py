"""Right-to-be-forgotten delete propagation over partitioned tables.

A GDPR/CCPA erasure request arrives as a small set of user ids; the
table is petabytes, day-partitioned. Rewriting the whole table per
request is a non-starter — the 100 TB pattern is:

1. one column-pruned scan (user_id + partition column only) finds the
   partitions that actually contain the users;
2. only those partitions are read back in full and rewritten with an
   anti-filter, via dynamic partition overwrite — untouched day
   directories keep their original files byte-for-byte (asserted in
   tests/test_retention.py).

Cost per request is O(rows in affected partitions), independent of
table history length — the same touched-partitions-only contract as
operators/incremental.py rollup maintenance. The id set rides along as
an `isin` literal (Catalyst compiles small sets to an in-predicate;
for very large erasure batches swap in a broadcast anti-join — the
partition-pruning structure is unchanged).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession


def affected_partitions(spark: SparkSession, path: str, user_ids,
                        partition_col: str = "day",
                        id_col: str = "user_id") -> list:
    """Partition values that contain at least one of `user_ids` —
    a column-pruned scan of (id_col, partition_col) only."""
    return [
        r[partition_col]
        for r in (spark.read.parquet(path)
                  .filter(F.col(id_col).isin(list(user_ids)))
                  .select(partition_col).distinct().collect())
    ]


def forget_users(spark: SparkSession, path: str, user_ids,
                 partition_col: str = "day",
                 id_col: str = "user_id") -> int:
    """Erase all rows of `user_ids`, rewriting ONLY the partitions that
    contain them. Returns the number of partitions rewritten."""
    days = affected_partitions(spark, path, user_ids, partition_col, id_col)
    if not days:
        return 0
    kept = (spark.read.parquet(path)
            .filter(F.col(partition_col).isin(days))   # partition-pruned
            .filter(~F.col(id_col).isin(list(user_ids))))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (kept.write.mode("overwrite").partitionBy(partition_col).parquet(path))
    return len(days)
