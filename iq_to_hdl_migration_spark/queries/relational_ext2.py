"""Second extended relational suite — the remaining TPC-H query shapes
(q2, q9, q11, q12, q16, q20, q21) adapted to the testdata columns (the
testdata has no partsupp table and no commit/receipt dates, so the
correlated/semi-join structure of each query is preserved while the
driving columns come from lineitem/part/supplier/orders).

With relational.py (q1,q3,q4,q5,q6,q10,q13) and relational_ext.py
(q7,q8,q14,q15,q17,q18,q19,q22) this completes all 22 TPC-H shapes.

Same determinism discipline: per-value DECIMAL casts before
aggregation (bit-stable vs the DuckDB oracle), DOUBLE presentation,
BIGINT counts, fully-deterministic ORDER BY before every LIMIT.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from iq_to_hdl_migration_spark.operators.dimjoin import scaled_dim
from iq_to_hdl_migration_spark.queries import register
from iq_to_hdl_migration_spark.sources.tables import load_table as _t

_EP = "CAST(l_extendedprice AS DECIMAL(12,2))"
_DISC = "CAST(l_discount AS DECIMAL(4,2))"
_QTY = "CAST(l_quantity AS DECIMAL(12,2))"


def _rev():
    return (F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")))


# ---------------------------------------------------------------------------
# q2 shape — min-value correlated subquery joined back to its group
# (TPC-H Q2's min(ps_supplycost); here min lineitem price per part).
# Scale shape: one grouped agg on l_partkey + an equi-join back on
# (partkey, price) — never a correlated per-row subquery.
# ---------------------------------------------------------------------------
@register(
    "q2_min_price_supplier",
    oracle=f"""
    WITH mn AS (
        SELECT l_partkey AS mn_partkey, MIN({_EP}) AS min_price
        FROM lineitem GROUP BY l_partkey
    ),
    li AS (
        SELECT DISTINCT l_partkey, l_suppkey, {_EP} AS ep FROM lineitem
    )
    SELECT p_partkey, p_name, s_name, CAST(min_price AS DOUBLE) AS min_price
    FROM part
    JOIN mn ON mn_partkey = p_partkey
    JOIN li ON li.l_partkey = p_partkey AND li.ep = min_price
    JOIN supplier ON s_suppkey = li.l_suppkey
    WHERE p_size <= 10
    ORDER BY p_partkey, s_name
    LIMIT 50
    """,
    doc="q2 shape: grouped-min + join-back (decorrelated min subquery)",
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        F.col("l_extendedprice").cast("decimal(12,2)").alias("ep"))
    mn = (li.groupBy(F.col("l_partkey").alias("mn_partkey"))
          .agg(F.min("ep").alias("min_price")))
    part = _t(spark, sf_dir, "part").where(F.col("p_size") <= 10)
    supp = _t(spark, sf_dir, "supplier")
    return (
        li.distinct()
        .join(mn, (F.col("l_partkey") == F.col("mn_partkey"))
              & (F.col("ep") == F.col("min_price")))
        .join(scaled_dim(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(scaled_dim(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("p_partkey", "p_name", "s_name",
                F.col("min_price").cast("double").alias("min_price"))
        .orderBy("p_partkey", "s_name")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# q9 shape — product-type profit by nation and year (5-way join +
# two-level group key with a derived year column).
# ---------------------------------------------------------------------------
@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS supp_nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM({_EP} * (1 - {_DISC})) AS DOUBLE) AS profit
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN part ON p_partkey = l_partkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
    doc="q9 shape: 5-way join, derived-column group key (J5/A2 analog)",
    bench=True,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(scaled_dim(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(scaled_dim(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(F.col("n_name").alias("supp_nation"),
                F.year("o_orderdate").cast("int").alias("o_year"),
                _rev().alias("rev"))
        .groupBy("supp_nation", "o_year")
        .agg(F.sum("rev").cast("double").alias("profit"))
    )


# ---------------------------------------------------------------------------
# q11 shape — per-group value filtered against a fraction of the global
# total (TPC-H Q11's HAVING > SUM(...)*fraction scalar subquery). The
# global total is a 1-row broadcast, not a correlated re-scan.
# ---------------------------------------------------------------------------
@register(
    "q11_part_value_share",
    # TPC-H Q11's literal fraction is 0.0001/SF — any FIXED fraction of
    # the global total empties as part count grows (0.002 matched 0
    # rows at every gate scale: round-4 verdict item 3). The
    # scale-invariant equivalent keeps parts above 1.5x the MEAN
    # per-part value: same grouped-agg-vs-global-scalar shape, and the
    # driver evidence is non-trivial at every sf (2 / 29 / 252 rows).
    oracle=f"""
    WITH pv AS (
        SELECT l_partkey,
               CAST(SUM({_EP} * (1 - {_DISC})) AS DOUBLE) AS part_value
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, part_value
    FROM pv
    WHERE part_value > (SELECT AVG(part_value) * 1.5 FROM pv)
    """,
    doc="q11 shape: grouped agg vs global-scalar subquery",
)
def q11_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", _rev().alias("rev"))
    per_part = (li.groupBy("l_partkey")
                .agg(F.sum("rev").cast("double").alias("part_value")))
    total = per_part.agg((F.avg("part_value") * F.lit(1.5))
                         .alias("threshold"))
    return (per_part.join(F.broadcast(total))
            .where(F.col("part_value") > F.col("threshold"))
            .select("l_partkey", "part_value"))


# ---------------------------------------------------------------------------
# q12 shape — two-way conditional aggregation (TPC-H Q12's shipmode
# priority cross-tab; l_linestatus stands in for l_shipmode).
# ---------------------------------------------------------------------------
@register(
    "q12_priority_lines",
    oracle="""
    SELECT l_linestatus AS line_status,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_prio_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_prio_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
    doc="q12 shape: conditional aggregation cross-tab (F2 CASE WHEN)",
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("l_linestatus").alias("line_status"))
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_prio_count"),
             F.sum(F.when(~high, 1).otherwise(0)).alias("low_prio_count"))
    )


# ---------------------------------------------------------------------------
# q16 shape — distinct-supplier counts per part attribute with a NOT IN
# exclusion subquery (left_anti against the excluded supplier set).
# ---------------------------------------------------------------------------
@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 40
    """,
    doc="q16 shape: NOT IN exclusion (left_anti) + COUNT DISTINCT",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    bad_supp = (_t(spark, sf_dir, "supplier")
                .where(F.col("s_acctbal") < 0).select("s_suppkey"))
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") != "Brand#1")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(scaled_dim(bad_supp),
                F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(scaled_dim(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(40)
    )


# ---------------------------------------------------------------------------
# q20 shape — semi-join chain: suppliers whose shipped quantity of a
# part-name family exceeds a threshold (TPC-H Q20's nested IN chain as
# grouped-agg → HAVING → left_semi).
# ---------------------------------------------------------------------------
@register(
    "q20_bulk_part_suppliers",
    oracle=f"""
    SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small%'
        GROUP BY l_suppkey
        HAVING SUM({_QTY}) > 50
    )
    ORDER BY s_name
    """,
    doc="q20 shape: agg-HAVING derived set + left_semi join",
)
def q20_bulk_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.join(scaled_dim(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("tot_qty"))
        .where(F.col("tot_qty") > 50)
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(big, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# q21 shape — EXISTS + NOT EXISTS self-joins on lineitem (TPC-H Q21's
# "sole failing supplier on a multi-supplier order"; l_returnflag='R'
# stands in for the late-delivery predicate). left_semi then left_anti
# on the same orderkey — both shuffles reuse the l_orderkey hash.
# ---------------------------------------------------------------------------
@register(
    "q21_sole_return_suppliers",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
    doc="q21 shape: EXISTS/NOT EXISTS self-joins as left_semi/left_anti",
    bench=True,
)
def q21_sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    l1 = (li.where(F.col("l_returnflag") == "R")
          .select("l_orderkey", "l_suppkey"))
    l2 = li.select(F.col("l_orderkey").alias("l2_ok"),
                   F.col("l_suppkey").alias("l2_sk"))
    l3 = (li.where(F.col("l_returnflag") == "R")
          .select(F.col("l_orderkey").alias("l3_ok"),
                  F.col("l_suppkey").alias("l3_sk")))
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F").select("o_orderkey")
    supp = _t(spark, sf_dir, "supplier")
    return (
        l1.join(l2, (F.col("l2_ok") == F.col("l_orderkey"))
                & (F.col("l2_sk") != F.col("l_suppkey")), "left_semi")
        .join(l3, (F.col("l3_ok") == F.col("l_orderkey"))
              & (F.col("l3_sk") != F.col("l_suppkey")), "left_anti")
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(scaled_dim(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(25)
    )


@register(
    "q_intersect_except_custkeys",
    oracle="""
    WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= DATE '1995-01-01'
                   AND o_orderdate < DATE '1996-01-01'),
         y96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= DATE '1996-01-01'
                   AND o_orderdate < DATE '1997-01-01')
    SELECT 'both' AS cohort, CAST(COUNT(*) AS BIGINT) AS n_custs
    FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
    UNION ALL
    SELECT 'only_1995', CAST(COUNT(*) AS BIGINT)
    FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
    """,
    doc="INTERSECT / EXCEPT set operations (SURVEY §2.6; the reference "
        "folds set-ops into its J15/J16 semi/anti joins — Spark's "
        "intersect/exceptAll compile to the same left-semi/left-anti)",
)
def q_intersect_except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    y95 = (od.filter((F.col("o_orderdate") >= "1995-01-01")
                     & (F.col("o_orderdate") < "1996-01-01"))
           .select("o_custkey").distinct())
    y96 = (od.filter((F.col("o_orderdate") >= "1996-01-01")
                     & (F.col("o_orderdate") < "1997-01-01"))
           .select("o_custkey").distinct())
    both = y95.intersect(y96).agg(
        F.count(F.lit(1)).alias("n_custs")).select(
        F.lit("both").alias("cohort"), "n_custs")
    only95 = y95.exceptAll(y96).agg(
        F.count(F.lit(1)).alias("n_custs")).select(
        F.lit("only_1995").alias("cohort"), "n_custs")
    return both.unionByName(only95)


@register(
    "events_json_typed",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT) AS sum_k,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.tag')
                              IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_tagged
    FROM events GROUP BY event_type
    """,
    doc="typed JSON extraction via schema'd parser (from_json), not "
        "regex — the parse happens once per row JVM-side and both "
        "fields project from the struct",
)
def events_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "j", F.from_json(F.col("props"), "k INT, tag STRING"))
    return (
        parsed.groupBy("event_type")
        .agg(F.sum(F.col("j.k")).cast("bigint").alias("sum_k"),
             F.sum(F.when(F.col("j.tag").isNotNull(), 1).otherwise(0))
             .cast("bigint").alias("n_tagged"))
    )


@register(
    "q_nation_revenue_dense_top3",
    oracle="""
    WITH r AS (
        SELECT n.n_name,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(4,2))))
                    AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    )
    SELECT n_name, revenue, CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT n_name, revenue,
                 DENSE_RANK() OVER (ORDER BY revenue DESC) AS rnk
          FROM r) t
    WHERE rnk <= 3
    """,
    doc="dense_rank top-3 (rank family beyond row_number): the window "
        "runs over the tiny 25-row aggregate, never the fact table",
)
def q_nation_revenue_dense_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice").cast("decimal(12,2)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")))
    r = (li.join(od, li["l_orderkey"] == od["o_orderkey"])
         .join(scaled_dim(cu), od["o_custkey"] == cu["c_custkey"])
         .join(F.broadcast(na), cu["c_nationkey"] == na["n_nationkey"])
         .groupBy("n_name")
         .agg(F.sum(rev).cast("double").alias("revenue")))
    w = Window.orderBy(F.desc("revenue"))
    return (r.withColumn("rnk", F.dense_rank().over(w).cast("int"))
            .filter(F.col("rnk") <= 3))
