"""Incremental materialized-rollup maintenance: keep a day-partitioned
aggregate table current by merging only the affected partitions —
never recomputing history.

The 100 TB pattern: a petabyte event log's daily rollup is maintained
by (1) aggregating just the delta, (2) unioning it with the CURRENT
rollup rows for the touched days only (partition pruning makes that
read cheap), (3) re-aggregating, and (4) rewriting only those
partitions via dynamic partition overwrite.  Cost per merge is
O(|delta| + |rollup rows of touched days|), independent of history
length.

Counts and decimal sums are re-aggregable partials (sum of sums); this
is the batch analog of the HLL sketch rollup in
queries/sketch_queries.py, and the maintenance loop behind the
reference's per-table status ledger idea (S14) applied to aggregates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

ROLLUP_KEYS = ["day", "event_type"]


def daily_rollup(events: DataFrame) -> DataFrame:
    """The rollup shape: per (day, event_type) count + decimal sum."""
    return (
        events.withColumn("day", F.to_date("ts"))
        .groupBy(*ROLLUP_KEYS)
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)"))
             .alias("total_value"))
    )


def init_rollup(events: DataFrame, path: str) -> None:
    """Create the day-partitioned rollup table."""
    (daily_rollup(events).write.mode("overwrite")
     .partitionBy("day").parquet(path))


def merge_delta(spark: SparkSession, path: str, delta: DataFrame) -> None:
    """Merge a delta of raw events into the rollup, touching only the
    partitions whose days appear in the delta."""
    delta_rollup = daily_rollup(delta)
    days = [r["day"] for r in delta_rollup.select("day").distinct().collect()]
    if not days:
        return
    existing = (spark.read.parquet(path)
                .filter(F.col("day").isin(days)))  # partition-pruned scan
    merged = (
        existing.select(*ROLLUP_KEYS, "n_events", "total_value")
        .unionByName(delta_rollup)
        .groupBy(*ROLLUP_KEYS)
        .agg(F.sum("n_events").cast("bigint").alias("n_events"),
             F.sum("total_value").cast("decimal(18,2)").alias("total_value"))
    )
    # dynamic partition overwrite: only the touched day= dirs rewrite
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (merged.write.mode("overwrite").partitionBy("day").parquet(path))
