"""MERGE (upsert) on partitioned parquet: apply a keyed batch of
inserts/updates, rewriting only the partitions the batch touches.

Lakehouse MERGE INTO re-expressed with plain DataFrame ops (no Delta
dependency): the updates batch determines the touched partition values
(its own partition column — one tiny distinct), the current rows of
ONLY those partitions are read back (partition-pruned scan), losers are
dropped with a left-anti join on the key, and winners + updates rewrite
those partitions via dynamic partition overwrite. Untouched partitions
keep their files byte-for-byte (asserted in tests/test_upsert.py).

Cost per merge is O(|updates| + |rows in touched partitions|),
independent of table history — the same contract as the incremental
rollup (operators/incremental.py) and erasure (operators/retention.py)
maintenance ops.

Self-referencing batches are safe at merge time (the dynamic
overwrite stages all output before committing, so the pruned read of
the current partitions completes first), but a caller holding a
DataFrame derived from the TARGET path must not reuse it after the
merge — its file listing is stale; re-read or localCheckpoint() it.

Caveat the operator enforces: an update row must carry the partition
value its key CURRENTLY lives in (true for day-keyed event/fact tables
where the partition is derived from the key's event time). Keys that
move between partitions need a delete+insert pair — the erasure op
covers the delete side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def merge_upsert(spark: SparkSession, path: str, updates: DataFrame,
                 key_cols: list[str], partition_col: str = "day") -> int:
    """MERGE `updates` into the parquet table at `path`: rows whose
    key exists are replaced, new keys are inserted. Returns the number
    of partitions rewritten."""
    parts = [r[0] for r in
             updates.select(partition_col).distinct().collect()]
    if not parts:
        return 0
    current = (spark.read.parquet(path)
               .filter(F.col(partition_col).isin(parts)))  # pruned scan
    survivors = current.join(
        updates.select(*key_cols).distinct(), on=key_cols, how="left_anti")
    merged = survivors.unionByName(updates.select(*current.columns))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (merged.write.mode("overwrite").partitionBy(partition_col).parquet(path))
    return len(parts)
