"""Bucketed staging: correctness + the shuffle-free join plan."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from iq_to_hdl_migration_spark.sources.bucketed import (
    cojoin_bucketed, write_bucketed)
from iq_to_hdl_migration_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_quantity", "l_extendedprice")
    orders = load_table(spark, sf_dir, "orders") \
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    write_bucketed(li, "bkt_lineitem", "l_orderkey", n_buckets=8)
    write_bucketed(orders, "bkt_orders", "l_orderkey", n_buckets=8)
    yield "bkt_lineitem", "bkt_orders"
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # at test scale the planner would broadcast instead (and skip the
    # bucket layout entirely); force the big-table code path — at
    # 100 TB neither side is broadcastable and THIS is the plan
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cojoin_bucketed(spark, lt, rt, "l_orderkey")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, \
            "bucketed join still shuffles:\n" + plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    bucketed = cojoin_bucketed(spark, lt, rt, "l_orderkey") \
        .groupBy("o_orderpriority").count()
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    plain = (li.join(orders, li.l_orderkey == orders.o_orderkey)
             .groupBy("o_orderpriority").count())
    assert sorted(map(tuple, bucketed.collect())) == \
        sorted(map(tuple, plain.collect()))


def test_bucketed_groupby_is_shuffle_free(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = (spark.table(lt).groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("q")))
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, \
        "groupBy on bucket key still shuffles:\n" + plan
