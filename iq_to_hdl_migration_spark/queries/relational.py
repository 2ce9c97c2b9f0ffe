"""Relational query suite over the TPC-H-ish testdata tables.

These exercise the engine's scan/filter/join/aggregate/sort operators
(SURVEY §2.2-§2.5) at data scale — the catalog-introspection versions of
the same operators live in `catalog_ops`. Reference analogs cited per
query; the reference issues these operator shapes against the remote
RDBMS (e.g. Migration/migration.py:1691 master 3-way join + 5-predicate
filter; :1699/1704 per-table count/sum aggregation loops) — here they
run *in* Spark with Catalyst doing pushdown/pruning/broadcast planning.

Determinism note: the testdata stores money columns as DOUBLE. Every
aggregate first casts per-value to DECIMAL (exact, identical in Spark
and DuckDB), sums exactly, and presents the result as DOUBLE — so the
driver's value-hash comparison is bit-stable across engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iq_to_hdl_migration_spark.operators.dimjoin import scaled_dim
from iq_to_hdl_migration_spark.queries import register
from iq_to_hdl_migration_spark.sources.tables import load_table as _t_impl


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _t_impl(spark, sf_dir, name)


def _dec(c: str, prec: int = 12, scale: int = 2):
    """Exact per-value decimal view of a double column (both engines
    round-to-nearest on cast; data has <= 2 real decimal digits)."""
    return F.col(c).cast(f"decimal({prec},{scale})")


_EP = "CAST(l_extendedprice AS DECIMAL(12,2))"
_DISC = "CAST(l_discount AS DECIMAL(4,2))"
_TAX = "CAST(l_tax AS DECIMAL(4,2))"
_QTY = "CAST(l_quantity AS DECIMAL(12,2))"


# ---------------------------------------------------------------------------
# q1 — pricing summary (TPC-H Q1 shape). Grouped aggregation with
# map-side partial agg; the Spark plan is a single shuffle on the
# 6-value (returnflag, linestatus) key. Reference analog: the grouped
# replacement for the per-table count/sum loops (migration.py:1699-1706).
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({_QTY}) AS DOUBLE) AS sum_qty,
           CAST(SUM({_EP}) AS DOUBLE) AS sum_base_price,
           CAST(SUM({_EP} * (1 - {_DISC})) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({_EP} * (1 - {_DISC}) * (1 + {_TAX})) AS DOUBLE) AS sum_charge,
           CAST(SUM({_QTY}) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(SUM({_EP}) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
           CAST(SUM({_DISC}) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="A1/A2 grouped agg; SURVEY §2.4 (migration.py:1699-1706)",
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1)).cast("double")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .select(
            "l_returnflag", "l_linestatus",
            _dec("l_quantity").alias("qty"),
            _dec("l_extendedprice").alias("ep"),
            _dec("l_discount", 4, 2).alias("disc"),
            _dec("l_tax", 4, 2).alias("tax"),
        )
        .withColumn("disc_price", F.col("ep") * (F.lit(1) - F.col("disc")))
        .withColumn("charge", F.col("disc_price") * (F.lit(1) + F.col("tax")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty").cast("double").alias("sum_qty"),
            F.sum("ep").cast("double").alias("sum_base_price"),
            F.sum("disc_price").cast("double").alias("sum_disc_price"),
            F.sum("charge").cast("double").alias("sum_charge"),
            (F.sum("qty").cast("double") / n).alias("avg_qty"),
            (F.sum("ep").cast("double") / n).alias("avg_price"),
            (F.sum("disc").cast("double") / n).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q3 — shipping priority (TPC-H Q3 shape). customer ⋈ orders ⋈ lineitem
# with selective filters on both sides; customer is sf-scaled so it is
# joined via scaled_dim (AQE broadcasts it while small, shuffle-joins it
# past the threshold); orders⋈lineitem shuffles on orderkey.
# Reference analog: 3-way master-inventory join J3 (migration.py:1691).
# ---------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({_EP} * (1 - {_DISC})) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="J3 3-way join + filters; SURVEY §2.3 (migration.py:1691)",
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp"))
    return (
        orders.join(scaled_dim(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("rev", _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 4, 2)))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev").cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q4 — order-priority checking (TPC-H Q4 shape): EXISTS → LEFT SEMI join
# with a non-equi conjunct. Reference analog: semi-join J16
# (pre_migration.py:669 options ∩ rules).
# ---------------------------------------------------------------------------
@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="J16 semi-join; SURVEY §2.3 (pre_migration.py:669)",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# q5 — local supplier volume (TPC-H Q5 shape): 6-way join. nation/
# region broadcast (const_dim); customer/supplier are scaled_dim (AQE
# decides); orders⋈lineitem shuffles on orderkey at scale.
# ---------------------------------------------------------------------------
@register(
    "q5_region_volume",
    oracle=f"""
    SELECT n_name, CAST(SUM({_EP} * (1 - {_DISC})) AS DOUBLE) AS revenue
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    doc="J5-style 4+way chained equi-join; SURVEY §2.3 (migration.py:2115)",
    bench=True,
)
def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(scaled_dim(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(scaled_dim(supp),
              (F.col("s_suppkey") == F.col("l_suppkey"))
              & (F.col("s_nationkey") == F.col("c_nationkey")))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .withColumn("rev", _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 4, 2)))
        .groupBy("n_name")
        .agg(F.sum("rev").cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q6 — forecasting revenue change (TPC-H Q6 shape): pure scan+filter+
# scalar agg — the pushdown showcase (PushedFilters on shipdate/qty).
# ---------------------------------------------------------------------------
@register(
    "q6_revenue_forecast",
    oracle=f"""
    SELECT CAST(SUM({_EP} * {_DISC}) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.02 AND l_discount <= 0.06
      AND l_quantity < 24
    """,
    doc="F18-style multi-predicate conjunction; SURVEY §2.2 (migration.py:1691)",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02) & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount", 4, 2))
            .cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q10 — returned items (TPC-H Q10 shape): join + group + top-k by
# revenue. Exercises O1 sort-desc (migration.py:1656-1662) with a
# deterministic tie-break.
# ---------------------------------------------------------------------------
@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({_EP} * (1 - {_DISC})) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="J1 + O1 sort/top-k; SURVEY §2.3/§2.5 (migration.py:651,1656)",
    bench=True,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(scaled_dim(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn("rev", _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 4, 2)))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum("rev").cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue",
                F.col("c_acctbal").cast("double").alias("c_acctbal"), "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q13 — customer order distribution (TPC-H Q13 shape): LEFT OUTER join +
# double aggregation. Exercises the outer-join family absent elsewhere.
# ---------------------------------------------------------------------------
@register(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    ) t
    GROUP BY c_count
    """,
    doc="left outer join + 2-level agg; SURVEY §2.3/§2.4",
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# q_anti_customers_without_orders — LEFT ANTI join: the resume-delta
# operator J15 (migration.py:1977 `[x for x in all if x not in done]`)
# expressed as Spark's left_anti at data scale.
# ---------------------------------------------------------------------------
@register(
    "q_anti_customers_without_orders",
    # the "done" set is orders placed on/after 1998: the driver's
    # synthetic data gives every customer at least one order overall,
    # which made the unfiltered anti-join a vacuous 0-rows-vs-0-rows
    # check at sf0.01 (round-4 verdict item 3) — the date filter keeps
    # the J15 shape and makes the evidence non-trivial (8 rows at
    # sf0.01, 74 at sf0.1)
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderdate >= TIMESTAMP '1998-01-01')
    """,
    doc="J15 anti-join (resume delta); SURVEY §2.3 (migration.py:1977,2675)",
)
def q_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    recent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    return (
        cust.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


# ---------------------------------------------------------------------------
# q_top_parts_by_revenue — part ⋈ lineitem (scaled_dim: AQE-planned) + top-k.
# ---------------------------------------------------------------------------
@register(
    "q_top_parts_by_revenue",
    oracle=f"""
    SELECT p_partkey, p_name, p_brand,
           CAST(SUM({_EP} * (1 - {_DISC})) AS DOUBLE) AS revenue,
           CAST(SUM({_QTY}) AS DOUBLE) AS total_qty
    FROM part JOIN lineitem ON l_partkey = p_partkey
    GROUP BY p_partkey, p_name, p_brand
    ORDER BY revenue DESC, p_partkey
    LIMIT 25
    """,
    doc="J6-style join vs full id set; SURVEY §2.3 (migration.py:663)",
)
def q_top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(scaled_dim(part), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("rev", _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 4, 2)))
        .groupBy("p_partkey", "p_name", "p_brand")
        .agg(F.sum("rev").cast("double").alias("revenue"),
             F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .orderBy(F.desc("revenue"), F.asc("p_partkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# q_nation_revenue_rank — window ranking over grouped revenue (SURVEY
# §2.10: windows absent in reference; provided as the Spark-native
# replacement for O3's cumulative batching pattern).
# ---------------------------------------------------------------------------
@register(
    "q_nation_revenue_rank",
    oracle=f"""
    SELECT n_name, revenue,
           CAST(RANK() OVER (ORDER BY revenue DESC, n_name) AS INTEGER) AS rev_rank,
           CAST(SUM(revenue) OVER (ORDER BY revenue DESC, n_name
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_total
    FROM (
        SELECT n_name, CAST(SUM({_EP} * (1 - {_DISC})) AS DOUBLE) AS revenue
        FROM nation
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY n_name
    ) t
    """,
    doc="window rank + running sum; SURVEY §2.10/O3 (migration.py:1753-1784)",
)
def q_nation_revenue_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    per_nation = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(scaled_dim(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn("rev", _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 4, 2)))
        .groupBy("n_name")
        .agg(F.sum("rev").cast("double").alias("revenue"))
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("n_name"))
    return per_nation.select(
        "n_name", "revenue",
        F.rank().over(w).cast("int").alias("rev_rank"),
        F.sum("revenue").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double").alias("running_total"),
    )


# ---------------------------------------------------------------------------
# q_lineitem_stats — global min/max/count scalar agg (A1/A6,
# migration.py:1699 count(*) loop + :2841 client-side max).
# ---------------------------------------------------------------------------
@register(
    "q_lineitem_stats",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           CAST(MIN(l_shipdate) AS TIMESTAMP) AS first_ship,
           CAST(MAX(l_shipdate) AS TIMESTAMP) AS last_ship
    FROM lineitem
    """,
    doc="A1 count / A6 max; SURVEY §2.4 (migration.py:1699,2841-2859)",
)
def q_lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


# ---------------------------------------------------------------------------
# q_union_order_events — UNION ALL shape (SURVEY §2.6
# combine_extracted_output ≡ unionByName, migration.py:3031-3046).
# ---------------------------------------------------------------------------
@register(
    "q_union_order_events",
    oracle="""
    SELECT kind, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT 'order' AS kind, o_orderkey AS id FROM orders
        UNION ALL
        SELECT 'lineitem' AS kind, l_orderkey AS id FROM lineitem
    ) t
    GROUP BY kind
    """,
    doc="§2.6 unionByName (migration.py:3031-3046)",
)
def q_union_order_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        F.lit("order").alias("kind"), F.col("o_orderkey").alias("id"))
    li = _t(spark, sf_dir, "lineitem").select(
        F.lit("lineitem").alias("kind"), F.col("l_orderkey").alias("id"))
    return orders.unionByName(li).groupBy("kind").agg(F.count(F.lit(1)).alias("n"))
