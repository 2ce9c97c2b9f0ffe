"""Registered queries locking the skew-join strategies' semantics:
each runs the skewed-join rewrite in Spark and the PLAIN equi-join in
the DuckDB oracle — a hash match proves the rewrite preserves join
semantics exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iq_to_hdl_migration_spark.operators.skew import (
    salted_join, split_hot_keys_join)
from iq_to_hdl_migration_spark.queries import register
from iq_to_hdl_migration_spark.sources.tables import load_table

_EP = "CAST(l_extendedprice AS DECIMAL(12,2))"
_DISC = "CAST(l_discount AS DECIMAL(4,2))"

_ORACLE = f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM({_EP} * (1 - {_DISC})) AS DOUBLE) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
"""


def _agg(joined: DataFrame) -> DataFrame:
    rev = (F.col("l_extendedprice").cast("decimal(12,2)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")))
    return (joined.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum(rev).cast("double").alias("revenue")))


@register(
    "skew_salted_join_revenue",
    oracle=_ORACLE,
    doc="salted orders-lineitem join (right side replicated x8, left "
        "scattered); oracle is the plain join — hash match proves the "
        "salt rewrite is semantics-preserving",
)
def skew_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .withColumnRenamed("l_orderkey", "o_orderkey"))
    orders = load_table(spark, sf_dir, "orders") \
        .select("o_orderkey", "o_orderpriority")
    return _agg(salted_join(li, orders, "o_orderkey", n_salts=8))


@register(
    "skew_split_hot_join_revenue",
    oracle=_ORACLE,
    doc="differentiated hot/cold join (hot keys broadcast, cold keys "
        "shuffled, exact union); oracle is the plain join",
)
def skew_split_hot_join_revenue(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .withColumnRenamed("l_orderkey", "o_orderkey"))
    orders = load_table(spark, sf_dir, "orders") \
        .select("o_orderkey", "o_orderpriority")
    # low threshold so BOTH paths execute even at test scale
    return _agg(split_hot_keys_join(li, orders, "o_orderkey",
                                    hot_threshold=5))


@register(
    "bucketed_colocated_join_revenue",
    oracle=_ORACLE,
    doc="same rollup over bucketed staging: both facts pre-bucketed by "
        "orderkey so the join runs with ZERO exchanges (the 100 TB "
        "co-location lever; plan-asserted in tests/test_bucketed.py); "
        "oracle is the plain join — hash match proves bucketing is "
        "semantics-preserving",
)
def bucketed_colocated_join_revenue(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    from iq_to_hdl_migration_spark.sources.bucketed import (
        bucketed_join, stage_bucketed)
    stage_bucketed(spark, sf_dir)
    joined = bucketed_join(spark, sf_dir, "orders", "lineitem",
                           "o_orderkey", "l_orderkey")
    return _agg(joined)


# ---------------------------------------------------------------------------
# Skew advisor: the diagnostic that decides WHICH mitigation above a
# join needs.  For each candidate lineitem join key it reports the
# exact distinct-key count, the widest key's row count and share, and
# rows-per-distinct-key — the numbers that tell you whether AQE's
# skew-join split suffices (mild skew) or the key needs salting /
# hot-key isolation (top-share >> 1/ndv).  One groupBy per key,
# partially aggregated map-side; no collect-driven logic.

@register(
    "skew_key_diagnostics",
    oracle="""
    WITH per_key AS (
        SELECT 'l_orderkey' AS join_key, l_orderkey AS k,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM lineitem GROUP BY 1, 2
        UNION ALL
        SELECT 'l_partkey', l_partkey, CAST(COUNT(*) AS BIGINT)
        FROM lineitem GROUP BY 1, 2
        UNION ALL
        SELECT 'l_suppkey', l_suppkey, CAST(COUNT(*) AS BIGINT)
        FROM lineitem GROUP BY 1, 2
    )
    SELECT join_key,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_keys,
           CAST(MAX(c) AS BIGINT) AS top_key_rows,
           CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
               AS top_key_share,
           CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS rows_per_key
    FROM per_key GROUP BY join_key
    """,
    doc="skew advisor: per candidate join key the exact ndv, hottest-"
        "key row count/share and rows-per-key — the decision inputs "
        "for AQE-split vs salting vs hot-key isolation; one map-side-"
        "combined groupBy per key",
)
def skew_key_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey")

    def diag(col: str) -> DataFrame:
        per_key = li.groupBy(F.col(col).alias("k")).agg(
            F.count(F.lit(1)).alias("c"))
        return per_key.agg(
            F.lit(col).alias("join_key"),
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).alias("n_distinct_keys"),
            F.max("c").alias("top_key_rows"),
            (F.max("c").cast("double")
             / F.sum("c").cast("double")).alias("top_key_share"),
            (F.sum("c").cast("double")
             / F.count(F.lit(1)).cast("double")).alias("rows_per_key"))

    return diag("l_orderkey").union(diag("l_partkey")).union(
        diag("l_suppkey"))
