"""Table layout management for scan efficiency at scale: partitioned
writes sized for the target file count, sort-within-file clustering for
row-group skipping, and small-file compaction.

At 100 TB the dominant cost of most queries is the scan; these three
knobs are how a Spark pipeline controls it:

* hive-style partition columns -> partition pruning (directories never
  listed/read when the filter excludes them);
* `sortWithinPartitions` on a high-selectivity column -> parquet
  row-group min/max stats become effective, so predicate pushdown
  skips pages inside the files that do get read;
* per-partition file sizing via `repartition(n, col)` +
  `maxRecordsPerFile` -> avoids both the small-files problem (driver
  listing, task overhead) and unsplittable giants.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str,
    cluster_col: str | None = None,
    files_per_partition: int = 1,
    max_records_per_file: int = 5_000_000,
) -> None:
    """Write `df` as hive-partitioned parquet with controlled file count
    and optional within-file clustering."""
    out = df.repartition(files_per_partition, F.col(partition_col))
    if cluster_col is not None:
        out = out.sortWithinPartitions(partition_col, cluster_col)
    (out.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(partition_col)
        .parquet(path))


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    partition_col: str,
    files_per_partition: int = 1,
) -> None:
    """Rewrite a (possibly fragmented) partitioned table with
    `files_per_partition` files per partition — the maintenance job that
    keeps streaming/incremental sinks scannable."""
    df = spark.read.parquet(path)
    write_partitioned(df, out_path, partition_col,
                      files_per_partition=files_per_partition)


def scan_stats(df: DataFrame) -> dict:
    """Inspect the executed plan's FileScan for pruning evidence:
    partition filters, pushed data filters, and file/partition counts.
    Used by tests to assert that layout actually changes the scan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "has_partition_filters": "PartitionFilters: [" in plan
        and "PartitionFilters: []" not in plan,
        "has_pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "plan": plan,
    }
