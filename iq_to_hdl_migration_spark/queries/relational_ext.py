"""Extended relational suite — TPC-H-shaped queries adapted to the
testdata columns, widening operator coverage: nation-pair joins with
cross predicates (q7), market share with conditional aggregation (q8),
promo-share (q14), revenue-view top supplier (q15), correlated
avg-subquery (q17), HAVING group filter (q18), OR-bracket predicates
(q19), NOT EXISTS + above-average filter (q22 shape).

Same determinism discipline as relational.py: per-value DECIMAL casts
before aggregation, DOUBLE presentation, BIGINT counts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iq_to_hdl_migration_spark.operators.dimjoin import scaled_dim
from iq_to_hdl_migration_spark.queries import register
from iq_to_hdl_migration_spark.sources.tables import load_table as _t

_EP = "CAST(l_extendedprice AS DECIMAL(12,2))"
_DISC = "CAST(l_discount AS DECIMAL(4,2))"
_QTY = "CAST(l_quantity AS DECIMAL(12,2))"


def _rev():
    return (F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")))


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               {_EP} * (1 - {_DISC}) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="q7 shape: nation-pair cross predicate + double self-join on "
        "nation (J8-style aliased self-join at data scale)",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    df = (
        li.join(scaled_dim(_t(spark, sf_dir, "supplier")),
                F.col("s_suppkey") == F.col("l_suppkey"))
        .join(_t(spark, sf_dir, "orders"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .join(scaled_dim(_t(spark, sf_dir, "customer")),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(((F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2"))
               | ((F.col("supp_nation") == "NATION_2")
                  & (F.col("cust_nation") == "NATION_1")))
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .withColumn("volume", _rev())
    )
    return (df.groupBy("supp_nation", "cust_nation", "l_year")
            .agg(F.sum("volume").cast("double").alias("revenue")))


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                         ELSE CAST(0.00 AS DECIMAL(12,2)) END) AS DOUBLE)
               / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               {_EP} * (1 - {_DISC}) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON l_partkey = p_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    """,
    doc="q8 shape: 8-way join + conditional aggregation market share",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    df = (
        _t(spark, sf_dir, "lineitem")
        .join(scaled_dim(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(scaled_dim(_t(spark, sf_dir, "supplier")),
              F.col("s_suppkey") == F.col("l_suppkey"))
        .join(_t(spark, sf_dir, "orders"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .join(scaled_dim(_t(spark, sf_dir, "customer")),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .withColumn("volume", _rev())
    )
    zero = F.lit("0.00").cast("decimal(12,2)")
    nation_vol = F.when(F.col("nation") == "NATION_3",
                        F.col("volume")).otherwise(zero)
    return (df.groupBy("o_year")
            .agg((F.sum(nation_vol).cast("double")
                  / F.sum("volume").cast("double")).alias("mkt_share")))


@register(
    "q14_promo_revenue_share",
    oracle=f"""
    SELECT CAST(100.00 AS DOUBLE) *
           CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN {_EP} * (1 - {_DISC})
                         ELSE CAST(0.00 AS DECIMAL(12,2)) END) AS DOUBLE)
           / CAST(SUM({_EP} * (1 - {_DISC})) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-07-01'
    """,
    doc="q14 shape: promo revenue share (conditional agg ratio)",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp")))
    zero = F.lit("0.00").cast("decimal(12,2)")
    df = (li.join(scaled_dim(_t(spark, sf_dir, "part")),
                  F.col("l_partkey") == F.col("p_partkey"))
          .withColumn("rev", _rev()))
    promo = F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(zero)
    return df.agg(
        (F.lit(100.0) * F.sum(promo).cast("double")
         / F.sum("rev").cast("double")).alias("promo_revenue_pct"))


@register(
    "q15_top_suppliers",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM({_EP} * (1 - {_DISC})) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
    doc="q15 shape: revenue view + scalar-subquery max filter",
)
def q15_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
    revenue = (li.withColumn("rev", _rev())
               .groupBy(F.col("l_suppkey").alias("supplier_no"))
               .agg(F.sum("rev").alias("total_rev")))
    max_rev = revenue.agg(F.max("total_rev").alias("m"))
    return (
        _t(spark, sf_dir, "supplier")
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_rev") == F.col("m"))
        .select("s_suppkey", "s_name",
                F.col("total_rev").cast("double").alias("total_revenue"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT CAST(SUM({_EP}) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
          SELECT 0.5 * AVG(CAST(l2.l_quantity AS DOUBLE))
          FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    doc="q17 shape: correlated avg subquery (decorrelated by Catalyst "
        "into an aggregate + join)",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    avg_qty = (li.groupBy(F.col("l_partkey").alias("ap_key"))
               .agg((F.lit(0.5) * F.avg(F.col("l_quantity").cast("double")))
                    .alias("half_avg")))
    return (
        li.join(scaled_dim(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("ap_key"))
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg((F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
              .cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customers",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(SUM({_QTY}) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM({_QTY}) > 150)
    GROUP BY c_custkey, c_name, o_orderkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
    doc="q18 shape: HAVING semi-join of big orders + top-k",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    big = (li.groupBy("l_orderkey").agg(F.sum(qty).alias("sq"))
           .where(F.col("sq") > 150).select("l_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .join(big.withColumnRenamed("l_orderkey", "bok"),
              F.col("o_orderkey") == F.col("bok"), "left_semi")
        .join(scaled_dim(_t(spark, sf_dir, "customer")),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey")
        .agg(F.sum(qty).cast("double").alias("total_qty"))
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q19_bracketed_revenue",
    oracle=f"""
    SELECT CAST(SUM({_EP} * (1 - {_DISC})) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    doc="q19 shape: OR-of-conjunction brackets (disjunctive pushdown)",
)
def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#7") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 40))
    )
    return (li.join(scaled_dim(part), F.col("l_partkey") == F.col("p_partkey"))
            .where(cond)
            .withColumn("rev", _rev())
            .agg(F.sum("rev").cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_items")))


@register(
    "q22_idle_rich_customers",
    # "idle" = no orders on/after 1998 (every customer in the driver's
    # synthetic data has SOME order, so the unfiltered NOT EXISTS was a
    # vacuous 0-row check at sf0.01 — round-4 verdict item 3); the date
    # bound keeps TPC-H Q22's above-average-balance + anti-join shape
    # with non-trivial driver evidence at every gate scale
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
            SELECT AVG(CAST(c_acctbal AS DOUBLE)) FROM customer
            WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1998-01-01')
    GROUP BY c_mktsegment
    """,
    doc="q22 shape: above-average balance + NOT EXISTS anti-join",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    recent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    avg_bal = (cust.where(F.col("c_acctbal") > 0.0)
               .agg(F.avg(F.col("c_acctbal").cast("double")).alias("ab")))
    return (
        cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("ab"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
             .cast("double").alias("totacctbal"))
    )
