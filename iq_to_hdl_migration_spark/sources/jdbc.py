"""Partitioned JDBC source — the production path for S1 extraction
(SURVEY §2.1: `spark.read.jdbc` with explicit column lists replaces
the reference's per-table SELECT + Temp_Extract_* file export,
migration.py:2085-2241).

The planning half is pure and unit-tested here; the read half is a
thin `spark.read.jdbc` call (exercised only when a JDBC URL/driver is
actually available — none ships in this container).

Partition planning mirrors the reference's sizing inputs: row count
and row width come from the catalog stats (A1/A2), the stride splits
[min_key, max_key] into numPartitions ranges exactly like Spark's own
JDBCRelation column partitioner, and numPartitions itself derives from
the table's byte size at ~128 MB per partition (P3) capped by the
per-node connection budget (Client_Num_Conn, common.py:297-300).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from iq_to_hdl_migration_spark.operators.planning import suggest_partitions


@dataclass(frozen=True)
class JdbcPartitionPlan:
    partition_column: str
    lower_bound: int
    upper_bound: int
    num_partitions: int

    def predicates(self) -> list[str]:
        """The WHERE ranges Spark will generate — exposed for tests and
        for engines that take explicit predicate lists."""
        n, lo, hi = self.num_partitions, self.lower_bound, self.upper_bound
        if n == 1:
            return ["1=1"]
        stride = (hi - lo) // n or 1
        preds = []
        bound = lo
        for i in range(n):
            lower = f"{self.partition_column} >= {bound}" if i else None
            bound += stride
            upper = f"{self.partition_column} < {bound}" if i < n - 1 else None
            parts = [p for p in (lower, upper) if p]
            preds.append(" AND ".join(parts) if parts else "1=1")
        return preds


def plan_partitions(partition_column: str, min_key: int, max_key: int,
                    size_bytes: int, max_connections: int = 64,
                    target_bytes: int = 128 * 1024 * 1024
                    ) -> JdbcPartitionPlan:
    """Size-aware partition plan for one table read.

    num_partitions = ceil(size / 128 MB), clamped to [1, max_connections]
    and to the key-range width (a range narrower than the partition
    count would produce empty strides).
    """
    if max_key < min_key:
        raise ValueError("max_key < min_key")
    by_size = suggest_partitions(size_bytes, target_bytes=target_bytes)
    width = max_key - min_key + 1
    n = max(1, min(by_size, max_connections, width))
    return JdbcPartitionPlan(partition_column, min_key, max_key, n)


def read_partitioned(spark: SparkSession, url: str, table: str,
                     plan: JdbcPartitionPlan, columns: list[str],
                     properties: dict | None = None) -> DataFrame:
    """Partitioned JDBC read with an explicit column list (column
    pruning at the source, migration.py:2185). Requires a JDBC driver
    on the classpath."""
    df = spark.read.jdbc(
        url, table,
        column=plan.partition_column,
        lowerBound=plan.lower_bound,
        upperBound=plan.upper_bound + 1,  # Spark's upper bound is exclusive
        numPartitions=plan.num_partitions,
        properties=properties or {})
    return df.select(*columns)
