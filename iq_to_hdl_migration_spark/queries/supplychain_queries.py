"""Operational / supply-chain analytics (SURVEY §2.11): fulfillment
latency, interval-overlap concurrency, and supply-redundancy risk.

Scale notes:
- `ship_latency_by_nation` contains the one legitimately big-big join
  (lineitem x orders on orderkey — both fact tables, so a shuffle join
  IS the right plan at 100 TB); the supplier/nation dims broadcast.
- `events_peak_concurrency` demonstrates the scalable prefix-sum
  pattern for interval-overlap counting: a naive running sum over ALL
  boundary events is a single-partition window (dead at scale), so the
  running sum is computed *within each day partition* and shifted by a
  per-day offset from a second window over the tiny day spine — the
  same two-level decomposition used by `decile_binned_revenue`.
- `part_supply_redundancy` is two shuffles on progressively smaller
  keys (partkey -> distinct-supplier count), both partial-agg first.

Determinism: boundary ties order starts-before-ends (delta DESC at
equal ts) in both engines; permuting identical (ts, delta) rows cannot
change any prefix value, so running sums are stable. Averages are one
double division of exact integer/decimal sums.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from iq_to_hdl_migration_spark.operators.dimjoin import scaled_dim
from iq_to_hdl_migration_spark.queries import register
from iq_to_hdl_migration_spark.sources.tables import load_table

_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap, microseconds


@register(
    "ship_latency_by_nation",
    oracle="""
    WITH lat AS (
        SELECT s_nationkey,
               date_diff('day', CAST(o_orderdate AS DATE),
                         CAST(l_shipdate AS DATE)) AS latency
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
    )
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_shipments,
           CAST(SUM(latency) AS BIGINT) AS sum_latency_days,
           CAST(SUM(latency) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS avg_latency_days,
           quantile_cont(latency, 0.5) AS p50_latency_days,
           CAST(MAX(latency) AS BIGINT) AS max_latency_days
    FROM lat JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="Order-to-ship latency per supplier nation. lineitem x orders "
        "is the legitimate big-big shuffle join; supplier/nation "
        "broadcast. SURVEY §2.11 ops analytics.",
)
def ship_latency_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    lat = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(scaled_dim(s.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name",
                F.datediff(F.col("l_shipdate").cast("date"),
                           F.col("o_orderdate").cast("date")).alias("latency"))
    )
    cnt = F.count(F.lit(1))
    return lat.groupBy("n_name").agg(
        cnt.cast("bigint").alias("n_shipments"),
        F.sum("latency").cast("bigint").alias("sum_latency_days"),
        (F.sum("latency").cast("double") / cnt.cast("double"))
            .alias("avg_latency_days"),
        F.expr("percentile(latency, 0.5)").alias("p50_latency_days"),
        F.max("latency").cast("bigint").alias("max_latency_days"),
    )


@register(
    "events_peak_concurrency",
    oracle=f"""
    WITH o AS (
        SELECT user_id, ts, epoch_us(ts) AS us,
               LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_us
        FROM events
    ), s AS (
        SELECT user_id, ts,
               SUM(CASE WHEN prev_us IS NULL OR us - prev_us > {_GAP_US}
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS sid
        FROM o
    ), iv AS (
        SELECT user_id, sid, MIN(ts) AS st, MAX(ts) AS en
        FROM s GROUP BY user_id, sid
    ), d AS (
        SELECT st AS ts, 1 AS delta FROM iv
        UNION ALL
        SELECT en AS ts, -1 AS delta FROM iv
    ), r AS (
        SELECT CAST(ts AS DATE) AS day, delta,
               SUM(delta) OVER (ORDER BY ts, delta DESC
                                ROWS UNBOUNDED PRECEDING) AS conc
        FROM d
    )
    SELECT day,
           CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
           CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_session_starts
    FROM r GROUP BY day
    """,
    doc="Peak concurrent sessions per day (30-min-gap sessions; "
        "interval-overlap counting). The oracle's single global running "
        "sum is replaced by a day-partitioned running sum plus a "
        "prior-day offset from the tiny day spine — no single-partition "
        "window over boundary events. SURVEY §2.11.",
    bench=True,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    is_new = F.when(prev.isNull() | ((us - prev) > _GAP_US), 1).otherwise(0)
    sid = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    iv = (ev.select("user_id", "ts", "event_id")
          .withColumn("sid", sid)
          .groupBy("user_id", "sid")
          .agg(F.min("ts").alias("st"), F.max("ts").alias("en")))
    deltas = (iv.select(F.col("st").alias("ts"), F.lit(1).alias("delta"))
              .unionAll(iv.select(F.col("en").alias("ts"),
                                  F.lit(-1).alias("delta")))
              .withColumn("day", F.col("ts").cast("date")))
    # level 1: running sum WITHIN each day (parallel across days)
    w_in_day = (Window.partitionBy("day")
                .orderBy(F.col("ts"), F.col("delta").desc())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    per_day = (deltas.withColumn("conc_in_day", F.sum("delta").over(w_in_day))
               .groupBy("day")
               .agg(F.max("conc_in_day").alias("peak_in_day"),
                    F.sum("delta").alias("day_total"),
                    F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
                        .cast("bigint").alias("n_session_starts")))
    # level 2: prior-day offset over the tiny day spine only
    w_days = (Window.orderBy("day")
              .rowsBetween(Window.unboundedPreceding, -1))
    return (per_day
            .withColumn("offset",
                        F.coalesce(F.sum("day_total").over(w_days), F.lit(0)))
            .select("day",
                    (F.col("peak_in_day") + F.col("offset")).cast("bigint")
                        .alias("peak_concurrency"),
                    "n_session_starts"))


@register(
    "part_supply_redundancy",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS n_suppliers
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(n_suppliers AS BIGINT) AS n_suppliers,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM ps GROUP BY n_suppliers
    """,
    doc="Supply-redundancy risk histogram: observed distinct suppliers "
        "per part (from shipments), rolled into a redundancy histogram. "
        "SURVEY §2.11 ops analytics.",
)
def part_supply_redundancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ps = (li.groupBy("l_partkey")
          .agg(F.countDistinct("l_suppkey").alias("n_suppliers")))
    return (ps.groupBy("n_suppliers")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
            .select(F.col("n_suppliers").cast("bigint").alias("n_suppliers"),
                    "n_parts"))


@register(
    "trade_flow_matrix",
    oracle="""
    WITH flow AS (
        SELECT s.s_nationkey AS supp_nk, c.c_nationkey AS cust_nk,
               CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer c ON o_custkey = c.c_custkey
        JOIN supplier s ON l_suppkey = s.s_suppkey
    )
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(CAST(SUM(rev) AS BIGINT) AS DOUBLE) / 10000.0 AS revenue
    FROM flow
    JOIN nation ns ON supp_nk = ns.n_nationkey
    JOIN nation nc ON cust_nk = nc.n_nationkey
    GROUP BY ns.n_name, nc.n_name
    """,
    doc="Full trade-flow matrix (generalized TPC-H Q7: every supplier "
        "nation x customer nation, not two fixed nations). Early "
        "aggregation to the (supp_nk, cust_nk) key pair — at most "
        "nations^2 groups — keeps the final rollup constant-size at "
        "any data volume; dims broadcast. Revenue accumulates as "
        "BIGINT fixed-point (1e-4 currency units): exact like the "
        "decimal formulation but long-backed, ~1.7x faster — "
        "sum(decimal(14,4)) widens to decimal(24,4), which falls off "
        "Spark's long-backed fast path. Overflow bound: int64 holds "
        "~9.2e18 / 2.5e8 avg rev ≈ 3.7e10 lineitems PER NATION PAIR, "
        "i.e. ~2.3e13 rows total at 625 pairs — two orders of "
        "magnitude past the 100 TB design point. SURVEY §2.11.",
    bench=True,
)
def trade_flow_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    # cents x basis: round() makes the 2-decimal doubles exact ints
    rev = (F.round(F.col("l_extendedprice") * 100).cast("bigint")
           * (F.lit(100)
              - F.round(F.col("l_discount") * 100).cast("bigint")))
    flow = (
        li.select("l_orderkey", "l_suppkey", rev.alias("rev"))
        .join(o.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(scaled_dim(c.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(scaled_dim(s.select("s_suppkey",
                                   F.col("s_nationkey").alias("supp_nk"))),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("supp_nk", F.col("c_nationkey").alias("cust_nk"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"),
             F.sum("rev").alias("rev_sum"))
    )
    ns = n.select(F.col("n_nationkey").alias("ns_nk"),
                  F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("nc_nk"),
                  F.col("n_name").alias("cust_nation"))
    return (flow
            .join(F.broadcast(ns), F.col("supp_nk") == F.col("ns_nk"))
            .join(F.broadcast(nc), F.col("cust_nk") == F.col("nc_nk"))
            .select("supp_nation", "cust_nation", "n_lines",
                    (F.col("rev_sum").cast("double") / F.lit(10000.0))
                    .alias("revenue")))


# ---------------------------------------------------------------------------
# daily order backlog (WIP curve): orders open between o_orderdate and
# their LAST line shipment. backlog(d) = cumulative opens(<= d) -
# cumulative closes(<= d) — two bounded-domain prefix sums over the
# day spine (the +1/-1 event formulation events_peak_concurrency uses,
# on the relational side), never a per-day interval scan.
# ---------------------------------------------------------------------------

@register(
    "orders_backlog_daily",
    oracle=f"""
    WITH closes AS (
        SELECT l_orderkey,
               MAX(date_diff('day', DATE '1970-01-01',
                             CAST(l_shipdate AS DATE))) AS close_day
        FROM lineitem GROUP BY l_orderkey
    ),
    spans AS (
        SELECT date_diff('day', DATE '1970-01-01',
                         CAST(o.o_orderdate AS DATE)) AS open_day,
               c.close_day
        FROM orders o JOIN closes c ON c.l_orderkey = o.o_orderkey
    ),
    deltas AS (
        SELECT open_day AS day_idx, 1 AS delta FROM spans
        UNION ALL
        SELECT close_day + 1 AS day_idx, -1 AS delta FROM spans
    ),
    daily AS (
        SELECT day_idx, CAST(SUM(delta) AS BIGINT) AS net
        FROM deltas GROUP BY day_idx
    )
    SELECT day_idx,
           CAST(SUM(net) OVER (ORDER BY day_idx
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS open_orders
    FROM daily
    """,
    doc="daily open-order backlog via the +1/-1 prefix-sum formulation "
        "(order opens at o_orderdate, closes after its last l_shipdate) "
        "— the running sum is over the bounded day spine of change "
        "days, not the fact table; NTZ->DATE day integers keep it "
        "session-TZ-independent",
)
def orders_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    epoch_day = ("CAST(datediff(CAST({c} AS DATE), DATE '1970-01-01')"
                 " AS BIGINT)")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    closes = (li.groupBy("l_orderkey")
              .agg(F.max(F.expr(epoch_day.format(c="l_shipdate")))
                   .alias("close_day")))
    spans = (orders.select(
        "o_orderkey",
        F.expr(epoch_day.format(c="o_orderdate")).alias("open_day"))
        .join(closes, F.col("o_orderkey") == F.col("l_orderkey")))
    deltas = (spans.select(F.col("open_day").alias("day_idx"),
                           F.lit(1).alias("delta"))
              .unionByName(spans.select(
                  (F.col("close_day") + 1).alias("day_idx"),
                  F.lit(-1).alias("delta"))))
    daily = deltas.groupBy("day_idx").agg(
        F.sum("delta").cast("bigint").alias("net"))
    w = (Window.orderBy("day_idx")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return daily.select(
        "day_idx", F.sum("net").over(w).cast("bigint").alias("open_orders"))


@register(
    "nation_trade_balance",
    oracle="""
    WITH flow AS (
        SELECT s.s_nationkey AS supp_nk, c.c_nationkey AS cust_nk,
               CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    AS DECIMAL(14,4)) AS rev
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer c ON o_custkey = c.c_custkey
        JOIN supplier s ON l_suppkey = s.s_suppkey
        WHERE s.s_nationkey != c.c_nationkey
    ),
    pairs AS (
        SELECT supp_nk, cust_nk, CAST(SUM(rev) AS DECIMAL(20,4)) AS rev
        FROM flow GROUP BY supp_nk, cust_nk
    ),
    exports AS (
        SELECT supp_nk AS nk, CAST(SUM(rev) AS DECIMAL(22,4)) AS export_rev
        FROM pairs GROUP BY supp_nk
    ),
    imports AS (
        SELECT cust_nk AS nk, CAST(SUM(rev) AS DECIMAL(22,4)) AS import_rev
        FROM pairs GROUP BY cust_nk
    )
    SELECT n.n_name AS nation,
           CAST(COALESCE(e.export_rev, 0) AS DOUBLE) AS export_rev,
           CAST(COALESCE(i.import_rev, 0) AS DOUBLE) AS import_rev,
           CAST(COALESCE(e.export_rev, 0) - COALESCE(i.import_rev, 0)
                AS DOUBLE) AS balance
    FROM nation n
    LEFT JOIN exports e ON e.nk = n.n_nationkey
    LEFT JOIN imports i ON i.nk = n.n_nationkey
    """,
    doc="per-nation cross-border trade balance (export minus import "
        "revenue over the Q7 flow network, intra-nation flows "
        "excluded); decimal-exact sums, early pair-key aggregation, "
        "dims broadcast — the rollup of trade_flow_matrix to one row "
        "per nation",
)
def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice").cast("decimal(12,2)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
           ).cast("decimal(14,4)")
    flow = (li.select("l_orderkey", "l_suppkey", rev.alias("rev"))
            .join(o.select("o_orderkey", "o_custkey"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(scaled_dim(c.select("c_custkey", "c_nationkey")),
                  F.col("o_custkey") == F.col("c_custkey"))
            .join(scaled_dim(s.select("s_suppkey", "s_nationkey")),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .where(F.col("s_nationkey") != F.col("c_nationkey")))
    pairs = (flow.groupBy(F.col("s_nationkey").alias("supp_nk"),
                          F.col("c_nationkey").alias("cust_nk"))
             .agg(F.sum("rev").cast("decimal(20,4)").alias("rev")))
    exports = (pairs.groupBy(F.col("supp_nk").alias("nk"))
               .agg(F.sum("rev").cast("decimal(22,4)").alias("export_rev")))
    imports = (pairs.groupBy(F.col("cust_nk").alias("nk"))
               .agg(F.sum("rev").cast("decimal(22,4)").alias("import_rev")))
    zero = F.lit(0).cast("decimal(22,4)")
    return (n.select(F.col("n_nationkey"), F.col("n_name").alias("nation"))
            .join(F.broadcast(exports),
                  F.col("n_nationkey") == exports["nk"], "left")
            .join(F.broadcast(imports),
                  F.col("n_nationkey") == imports["nk"], "left")
            .select("nation",
                    F.coalesce("export_rev", zero).cast("double")
                    .alias("export_rev"),
                    F.coalesce("import_rev", zero).cast("double")
                    .alias("import_rev"),
                    (F.coalesce("export_rev", zero)
                     - F.coalesce("import_rev", zero)).cast("double")
                    .alias("balance")))


# ---------------------------------------------------------------------------
# Ship-lag SLA profile: order-to-ship latency distribution per order
# priority — the "are URGENT orders actually shipped faster" SLA
# readout. Lags are integer days (datediff — identical in both
# engines), and the p50/p90 use the constructive rank-interpolation
# idiom (events_funnel_dropoff_time): order statistics at floor/ceil
# of (n-1)q with the integer-remainder fraction, so the percentiles
# are bit-equal across engines BY CONSTRUCTION. One orders-lineitem
# join on the order key, one priority-partitioned window.
# ---------------------------------------------------------------------------


@register(
    "orders_ship_lag_profile",
    oracle="""
    WITH lag AS (
        SELECT o.o_orderpriority AS priority,
               CAST(datediff('day', o.o_orderdate, l.l_shipdate)
                    AS BIGINT) AS lag_days
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    ranked AS (
        SELECT priority, lag_days,
               ROW_NUMBER() OVER (PARTITION BY priority
                                  ORDER BY lag_days) - 1 AS rn
        FROM lag
    ),
    cnt AS (
        SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(MIN(lag_days) AS BIGINT) AS min_lag_days,
               CAST(MAX(lag_days) AS BIGINT) AS max_lag_days,
               CAST(SUM(lag_days) AS BIGINT) AS sum_lag_days
        FROM lag GROUP BY priority
    ),
    pick AS (
        SELECT r.priority, c.n_lines, c.min_lag_days, c.max_lag_days,
               c.sum_lag_days,
            MAX(CASE WHEN rn = ((n_lines - 1) * 5) // 10
                     THEN lag_days END) AS lo5,
            MAX(CASE WHEN rn = LEAST(((n_lines - 1) * 5) // 10 + 1,
                                     n_lines - 1)
                     THEN lag_days END) AS hi5,
            MAX(CASE WHEN rn = ((n_lines - 1) * 9) // 10
                     THEN lag_days END) AS lo9,
            MAX(CASE WHEN rn = LEAST(((n_lines - 1) * 9) // 10 + 1,
                                     n_lines - 1)
                     THEN lag_days END) AS hi9
        FROM ranked r JOIN cnt c ON c.priority = r.priority
        GROUP BY r.priority, c.n_lines, c.min_lag_days, c.max_lag_days,
                 c.sum_lag_days
    )
    SELECT priority, n_lines, min_lag_days, max_lag_days,
           CAST(lo5 AS DOUBLE)
             + CAST(((n_lines - 1) * 5) % 10 AS DOUBLE) / 10.0
               * CAST(hi5 - lo5 AS DOUBLE) AS p50_lag_days,
           CAST(lo9 AS DOUBLE)
             + CAST(((n_lines - 1) * 9) % 10 AS DOUBLE) / 10.0
               * CAST(hi9 - lo9 AS DOUBLE) AS p90_lag_days,
           CAST(sum_lag_days AS DOUBLE) / CAST(n_lines AS DOUBLE)
               AS mean_lag_days
    FROM pick
    """,
    doc="order-to-ship latency SLA per order priority: min/max and "
        "bit-stable p50/p90 (constructive integer-rank interpolation, "
        "the events_funnel_dropoff_time idiom) plus the exact rational "
        "mean over integer day lags — the does-URGENT-ship-faster "
        "audit; one order-key join, one priority-partitioned window "
        "over a 5-value bounded priority domain",
)
def orders_ship_lag_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate")
    lag = (li.join(o, li.l_orderkey == o.o_orderkey)
           .select(F.col("o_orderpriority").alias("priority"),
                   F.datediff("l_shipdate", "o_orderdate").cast("bigint")
                   .alias("lag_days")))
    w = Window.partitionBy("priority").orderBy("lag_days")
    ranked = lag.withColumn(
        "rn", F.row_number().over(w).cast("bigint") - 1)
    cnt = lag.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.min("lag_days").cast("bigint").alias("min_lag_days"),
        F.max("lag_days").cast("bigint").alias("max_lag_days"),
        F.sum("lag_days").cast("bigint").alias("sum_lag_days"))

    def _at(ix_expr, out):
        return F.max(F.when(F.col("rn") == ix_expr,
                            F.col("lag_days"))).alias(out)

    def _lo_ix(q):
        return F.expr(f"((n_lines - 1) * {q}) div 10")

    def _hi_ix(q):
        return F.least(_lo_ix(q) + 1, F.col("n_lines") - 1)

    pick = (ranked.join(cnt, "priority")
            .groupBy("priority", "n_lines", "min_lag_days",
                     "max_lag_days", "sum_lag_days")
            .agg(_at(_lo_ix(5), "lo5"), _at(_hi_ix(5), "hi5"),
                 _at(_lo_ix(9), "lo9"), _at(_hi_ix(9), "hi9")))

    def _interp(q, lo, hi):
        return (F.col(lo).cast("double")
                + F.expr(f"CAST(((n_lines - 1) * {q}) % 10 AS DOUBLE)")
                / F.lit(10.0)
                * (F.col(hi) - F.col(lo)).cast("double"))

    return pick.select(
        "priority", "n_lines", "min_lag_days", "max_lag_days",
        _interp(5, "lo5", "hi5").alias("p50_lag_days"),
        _interp(9, "lo9", "hi9").alias("p90_lag_days"),
        (F.col("sum_lag_days").cast("double")
         / F.col("n_lines").cast("double")).alias("mean_lag_days"))


# ---------------------------------------------------------------------------
# Repeat-purchase cadence: the gap in days between a customer's
# consecutive orders, bucketed into weeks and profiled per market
# segment — the replenishment-cycle histogram behind demand forecasting
# and churn-risk scoring (a segment whose gap mass shifts right is
# churning). Scale shape: the lag window partitions by custkey (orders
# per customer is bounded and small — constant per-key state), the
# orders↔customer join shuffles on custkey (both fact-scale at 100 TB,
# so a shuffle join IS the right plan; AQE handles skew), and the
# final groupBy lands on (segment × week-bucket) — a bounded grid.
# Integer-exact throughout: day gaps, week buckets, counts.
# ---------------------------------------------------------------------------

@register(
    "orders_reorder_gap_profile",
    oracle="""
    WITH g AS (
        SELECT o_custkey,
               date_diff('day',
                   LAG(o_orderdate) OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap_days
        FROM orders
    )
    SELECT c_mktsegment AS mktsegment,
           CAST(gap_days // 7 AS INTEGER) AS gap_week,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(MIN(gap_days) AS BIGINT) AS min_gap_days,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap_days
    FROM g JOIN customer ON o_custkey = c_custkey
    WHERE gap_days IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="repeat-purchase cadence profile: per-customer consecutive-"
        "order gaps (lag window, deterministic orderdate+orderkey "
        "tie-break) bucketed into weeks and profiled per market "
        "segment — the replenishment-cycle histogram behind demand "
        "forecasting and churn risk; custkey-partitioned window + one "
        "custkey shuffle join, bounded (segment × week) output grid",
)
def orders_reorder_gap_profile(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (orders.select(
                "o_custkey",
                F.datediff(F.col("o_orderdate"),
                           F.lag("o_orderdate").over(w)).alias("gap_days"))
            .where(F.col("gap_days").isNotNull()))
    return (gaps.join(cust, gaps.o_custkey == cust.c_custkey)
            .groupBy(F.col("c_mktsegment").alias("mktsegment"),
                     F.expr("gap_days div 7").cast("int").alias("gap_week"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
                 F.countDistinct("o_custkey").cast("bigint")
                 .alias("n_customers"),
                 F.min("gap_days").cast("bigint").alias("min_gap_days"),
                 F.max("gap_days").cast("bigint").alias("max_gap_days")))


@register(
    "part_abc_classification",
    oracle="""
    WITH pr AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2))))
                    AS DECIMAL(18,4)) AS rev
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT rev,
               SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                              ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(rev) OVER () AS tot
        FROM pr
    ),
    cls AS (
        SELECT CASE WHEN cum * 10 <= tot * 8 THEN 'A'
                    WHEN cum * 100 <= tot * 95 THEN 'B'
                    ELSE 'C' END AS abc_class,
               rev
        FROM ranked
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev) AS DOUBLE) AS revenue,
           CAST((1000000 * COUNT(*))
                // (SELECT COUNT(*) FROM pr) AS BIGINT) AS part_share_ppm
    FROM cls GROUP BY abc_class
    """,
    doc="ABC inventory classification of parts by discounted revenue: "
        "class A = parts inside the first 80% of cumulative revenue, "
        "B = to 95%, C = the tail — class sizes, revenue mass and "
        "part-count share; thresholds as exact decimal "
        "cross-multiplication (cum*10 <= tot*8), never float "
        "comparisons. The cumulative window sorts the PER-PART "
        "aggregate (one row per part), not lineitem; 3-row output",
)
def part_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pr = (li.withColumn(
        "rev", F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")))
        .groupBy("l_partkey")
        .agg(F.sum("rev").cast("decimal(18,4)").alias("rev")))
    w = Window.orderBy(F.desc("rev"), F.asc("l_partkey"))
    ranked = pr.select(
        "rev",
        F.sum("rev").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("rev").over(
            Window.partitionBy().rowsBetween(Window.unboundedPreceding,
                                             Window.unboundedFollowing))
        .alias("tot"))
    n_parts_total = pr.agg(
        F.count(F.lit(1)).cast("bigint").alias("npt"))
    cls = ranked.select(
        F.when(F.col("cum") * 10 <= F.col("tot") * 8, F.lit("A"))
        .when(F.col("cum") * 100 <= F.col("tot") * 95, F.lit("B"))
        .otherwise(F.lit("C")).alias("abc_class"),
        "rev")
    return (cls.groupBy("abc_class")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"),
                 F.sum("rev").cast("double").alias("revenue"))
            .join(F.broadcast(n_parts_total), F.lit(True))
            .select("abc_class", "n_parts", "revenue",
                    F.expr("(1000000 * n_parts) div npt").cast("bigint")
                    .alias("part_share_ppm")))
