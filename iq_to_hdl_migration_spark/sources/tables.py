"""Parquet dataset sources for the synthetic star schema.

Reference analog: the extract phase's full-table scans with explicit
column lists (Migration/migration.py:2185-2197) — here expressed as
`spark.read.parquet(...)` so Catalyst drives column pruning and filter
pushdown instead of hand-written SELECT lists (SURVEY §2.1 S1).

Schemas are never inferred from data at runtime in the reference
(always catalog-derived, migration.py:1520); parquet is self-describing
so the same property holds for free.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; normalizes events.ts (stored as TIMESTAMP(NANOS),
    which Spark's vectorized parquet reader rejects) to a microsecond
    timestamp — same truncation DuckDB applies when casting its
    TIMESTAMP_NS to TIMESTAMP."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str,
                names: list[str] | None = None) -> dict[str, DataFrame]:
    """Load the benchmark tables as DataFrames (lazy — no scan yet)."""
    return {t: load_table(spark, sf_dir, t) for t in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str,
                   names: list[str] | None = None) -> None:
    """Register each table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
