"""Gaps-and-islands and co-occurrence (market-basket) analytics over
the events table — beyond-reference operators (SURVEY §2.11).

Scale notes:
- `events_activity_islands` is the classic gaps-and-islands rewrite:
  distinct active days → row_number per user → group by (user,
  date - rn). Two shuffles, both on user_id (high-cardinality, even);
  per-user partitions hold only distinct DAYS (bounded by the calendar,
  not by event volume), so the window never sees raw-event cardinality.
- `events_type_affinity` avoids the naive self-join of the (user, type)
  relation on user_id (which shuffles the corpus twice). Instead ONE
  groupBy(user).collect_set builds the bounded per-user type set
  (|set| <= #event_types, a small constant), and pair generation is a
  double explode with a < b — output is bounded by #users x C(T,2),
  never quadratic in events. Lift's numerator/denominator are exact
  BIGINT products with a single double division, so Spark and DuckDB
  agree bitwise.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from iq_to_hdl_migration_spark.operators.dimjoin import scaled_dim
from iq_to_hdl_migration_spark.queries import register
from iq_to_hdl_migration_spark.sources.tables import load_table


@register(
    "events_activity_islands",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), numbered AS (
        SELECT user_id, d,
               d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                        AS INTEGER) AS grp
        FROM days
    ), runs AS (
        SELECT user_id, COUNT(*) AS run_len
        FROM numbered GROUP BY user_id, grp
    )
    SELECT CAST(run_len AS BIGINT) AS run_len,
           CAST(COUNT(*) AS BIGINT) AS n_runs,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM runs GROUP BY run_len
    """,
    doc="Gaps-and-islands: contiguous active-day streak lengths per "
        "user, rolled into a run-length histogram. SURVEY §2.11.",
)
def events_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = (ev.select("user_id", F.col("ts").cast("date").alias("d"))
            .distinct())
    w = Window.partitionBy("user_id").orderBy("d")
    runs = (
        days.withColumn("grp", F.date_sub("d", F.row_number().over(w)))
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return runs.groupBy("run_len").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_runs"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    ).select(F.col("run_len").cast("bigint").alias("run_len"),
             "n_runs", "n_users")


@register(
    "events_type_affinity",
    oracle="""
    WITH d AS (
        SELECT DISTINCT user_id, event_type FROM events
    ), u AS (
        SELECT COUNT(DISTINCT user_id) AS nu FROM d
    ), ta AS (
        SELECT event_type, COUNT(*) AS na FROM d GROUP BY event_type
    ), p AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS nab
        FROM d a JOIN d b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT type_a, type_b,
           CAST(nab AS BIGINT) AS n_both,
           CAST(nab AS DOUBLE) / CAST(nu AS DOUBLE) AS support,
           CAST(nab * nu AS DOUBLE)
               / CAST(ta1.na * ta2.na AS DOUBLE) AS lift
    FROM p
    CROSS JOIN u
    JOIN ta ta1 ON ta1.event_type = type_a
    JOIN ta ta2 ON ta2.event_type = type_b
    """,
    doc="Market-basket affinity of event types across users: support "
        "and lift per unordered type pair. Pair generation is a double "
        "explode of the bounded per-user type set (ONE shuffle), not a "
        "corpus self-join. SURVEY §2.11.",
)
def events_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = (ev.groupBy("user_id")
                .agg(F.array_sort(F.collect_set("event_type")).alias("types")))
    n_users = per_user.count()  # scalar aggregate, not a driver loop
    pairs = (
        per_user.select(F.explode("types").alias("type_a"), "types")
        .select("type_a", F.explode("types").alias("type_b"))
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("nab"))
    )
    ta = (per_user.select(F.explode("types").alias("event_type"))
          .groupBy("event_type")
          .agg(F.count(F.lit(1)).alias("na")))
    return (
        pairs
        .join(F.broadcast(ta.withColumnRenamed("event_type", "type_a")
                          .withColumnRenamed("na", "na_a")), "type_a")
        .join(F.broadcast(ta.withColumnRenamed("event_type", "type_b")
                          .withColumnRenamed("na", "na_b")), "type_b")
        .select(
            "type_a", "type_b",
            F.col("nab").cast("bigint").alias("n_both"),
            (F.col("nab").cast("double") / F.lit(float(n_users)))
                .alias("support"),
            ((F.col("nab") * F.lit(n_users)).cast("double")
             / (F.col("na_a") * F.col("na_b")).cast("double")).alias("lift"),
        )
    )


@register(
    "attribution_first_click",
    oracle="""
    WITH u AS (
        SELECT user_id, event_type, epoch_us(ts) AS us,
               CASE WHEN event_type = 'click' THEN epoch_us(ts) END
                   AS click_us
        FROM events
    ), w AS (
        SELECT user_id, event_type, us,
               MIN(click_us) OVER (PARTITION BY user_id ORDER BY us
                                   RANGE BETWEEN 86400000000 PRECEDING
                                         AND CURRENT ROW)
                   AS first_click_us
        FROM u
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN first_click_us IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
           CAST(SUM(CASE WHEN first_click_us IS NOT NULL
                         THEN (us - first_click_us) // 1000000
                         ELSE 0 END) AS BIGINT) AS sum_secs_click_to_buy,
           CAST(SUM(CASE WHEN first_click_us IS NOT NULL
                         THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS attribution_rate
    FROM w WHERE event_type = 'purchase'
    """,
    doc="First-touch attribution via a value-RANGE window frame: for "
        "each purchase, the user's EARLIEST click in the preceding 24h "
        "(min over RANGE 86400e6-us PRECEDING — one shuffle on "
        "user_id, no self-join, state bounded by the frame). "
        "Complements the as-of (last-touch) join. SURVEY §2.11.",
)
def attribution_first_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    u = ev.select(
        "user_id", "event_type", us.alias("us"),
        F.when(F.col("event_type") == "click", us).alias("click_us"))
    w = (Window.partitionBy("user_id").orderBy("us")
         .rangeBetween(-86_400_000_000, Window.currentRow))
    attributed = (
        u.withColumn("first_click_us", F.min("click_us").over(w))
        .where(F.col("event_type") == "purchase")
    )
    has = F.when(F.col("first_click_us").isNotNull(), 1).otherwise(0)
    secs = F.when(
        F.col("first_click_us").isNotNull(),
        F.floor((F.col("us") - F.col("first_click_us")) / 1_000_000)
    ).otherwise(0)
    return attributed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.sum(has).cast("bigint").alias("n_attributed"),
        F.sum(secs).cast("bigint").alias("sum_secs_click_to_buy"),
        (F.sum(has).cast("double") / F.count(F.lit(1)).cast("double"))
            .alias("attribution_rate"),
    )


@register(
    "nation_pareto_8020",
    oracle="""
    WITH cr AS (
        SELECT c_nationkey, o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
                    AS DECIMAL(18,2)) AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey, o_custkey
    ), ranked AS (
        SELECT c_nationkey, rev,
               SUM(rev) OVER (PARTITION BY c_nationkey
                              ORDER BY rev DESC, o_custkey
                              ROWS UNBOUNDED PRECEDING) AS cum_rev,
               SUM(rev) OVER (PARTITION BY c_nationkey) AS tot_rev,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY rev DESC, o_custkey) AS rk,
               COUNT(*) OVER (PARTITION BY c_nationkey) AS n_cust
        FROM cr
    )
    SELECT n_name,
           CAST(MAX(n_cust) AS BIGINT) AS n_customers,
           CAST(MIN(CASE WHEN cum_rev * 5 >= tot_rev * 4 THEN rk END)
                AS BIGINT) AS n_top80,
           CAST(MIN(CASE WHEN cum_rev * 5 >= tot_rev * 4 THEN rk END)
                AS DOUBLE) / CAST(MAX(n_cust) AS DOUBLE) AS top80_share
    FROM ranked JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="Pareto concentration per nation: smallest customer count "
        "covering 80% of revenue. The 80% test is exact decimal "
        "cross-multiplication (cum*5 >= tot*4) — no float thresholds; "
        "windows partition by nation, so no global sort. SURVEY §2.11.",
)
def nation_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cr = (o.select("o_custkey",
                   F.col("o_totalprice").cast("decimal(14,2)").alias("tp"))
          .join(scaled_dim(c.select("c_custkey", "c_nationkey")),
                F.col("o_custkey") == F.col("c_custkey"))
          .groupBy("c_nationkey", "o_custkey")
          .agg(F.sum("tp").cast("decimal(18,2)").alias("rev")))
    wo = Window.partitionBy("c_nationkey").orderBy(F.col("rev").desc(),
                                                   F.col("o_custkey"))
    wp = Window.partitionBy("c_nationkey")
    ranked = cr.select(
        "c_nationkey", "rev",
        F.sum("rev").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("cum_rev"),
        F.sum("rev").over(wp).alias("tot_rev"),
        F.row_number().over(wo).alias("rk"),
        F.count(F.lit(1)).over(wp).alias("n_cust"),
    )
    hit = F.when(F.col("cum_rev") * 5 >= F.col("tot_rev") * 4,
                 F.col("rk"))
    return (ranked
            .join(F.broadcast(n.select("n_nationkey", "n_name")),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(F.max("n_cust").cast("bigint").alias("n_customers"),
                 F.min(hit).cast("bigint").alias("n_top80"),
                 (F.min(hit).cast("double")
                  / F.max("n_cust").cast("double")).alias("top80_share")))


_BASKET_MIN_SUP = 2   # orders containing the pair
_BASKET_TOPK = 50

# shared with the streaming twin (stream_market_basket), whose folded
# supports must reproduce this batch result exactly
MARKET_BASKET_ORACLE = f"""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pair_sup AS (
        SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
               CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM baskets x JOIN baskets y USING (l_orderkey)
        WHERE x.l_partkey < y.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= {_BASKET_MIN_SUP}
    ),
    item_sup AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n
        FROM baskets GROUP BY l_partkey
    ),
    tot AS (
        SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        FROM baskets
    )
    SELECT p.part_a, p.part_b, p.n_ab,
           a.n AS n_a, b.n AS n_b,
           CAST(p.n_ab AS DOUBLE) / CAST(a.n AS DOUBLE) AS confidence_ab,
           CAST(p.n_ab * t.n_orders AS DOUBLE)
               / CAST(a.n * b.n AS DOUBLE) AS lift
    FROM pair_sup p
    JOIN item_sup a ON a.l_partkey = p.part_a
    JOIN item_sup b ON b.l_partkey = p.part_b
    CROSS JOIN tot t
    ORDER BY lift DESC, part_a, part_b
    LIMIT {_BASKET_TOPK}
    """


@register(
    "orders_market_basket_lift",
    oracle=MARKET_BASKET_ORACLE,
    doc=f"market-basket association rules over orders: top-{_BASKET_TOPK} "
        f"part pairs by lift (support >= {_BASKET_MIN_SUP} orders) with "
        "confidence — the a-priori building block. Baskets come from ONE "
        "groupBy(order).collect_set (pair generation bounded by order "
        "width squared, never a corpus self-join — the same shape as "
        "events_type_affinity); supports are exact BIGINT, lift/"
        "confidence one double division each, top-k compiles to "
        "TakeOrderedAndProject.",
    bench=True,
)
def orders_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    baskets = (li.groupBy("l_orderkey")
               .agg(F.sort_array(F.collect_set("l_partkey"))
                    .alias("parts")))
    pair_sup = (basket_pair_supports(baskets)
                .where(F.col("n_ab") >= _BASKET_MIN_SUP))
    item_sup = (baskets.select(F.explode("parts").alias("l_partkey"))
                .groupBy("l_partkey")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    tot = baskets.agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    return basket_lift_report(pair_sup, item_sup, tot)


def basket_pair_supports(baskets: DataFrame) -> DataFrame:
    """(part_a < part_b, n_ab) pair supports from a basket frame with a
    sorted `parts` array — the in-basket explode bounded by order
    width; shared by the batch query and the streaming fold."""
    return (baskets.select(
        F.explode(F.expr("""
            flatten(transform(parts, (x, i) ->
                transform(slice(parts, i + 2, size(parts)), y ->
                    struct(x AS part_a, y AS part_b))))
        """)).alias("p"))
        .groupBy("p.part_a", "p.part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab")))


def basket_lift_report(pair_sup: DataFrame, item_sup: DataFrame,
                       tot: DataFrame) -> DataFrame:
    """confidence/lift top-k from support tables — the report tail the
    streaming twin must reproduce bit-for-bit from its folded state
    (supports are integers, so the two double divisions agree)."""
    out = (pair_sup
           .join(item_sup.select(F.col("l_partkey").alias("part_a"),
                                 F.col("n").alias("n_a")), "part_a")
           .join(item_sup.select(F.col("l_partkey").alias("part_b"),
                                 F.col("n").alias("n_b")), "part_b")
           .join(F.broadcast(tot))
           .select("part_a", "part_b", "n_ab", "n_a", "n_b",
                   (F.col("n_ab").cast("double")
                    / F.col("n_a").cast("double")).alias("confidence_ab"),
                   ((F.col("n_ab") * F.col("n_orders")).cast("double")
                    / (F.col("n_a") * F.col("n_b")).cast("double"))
                   .alias("lift")))
    return out.orderBy(F.desc("lift"), "part_a", "part_b").limit(_BASKET_TOPK)


AB_TEST_ORACLE = """
    WITH users AS (
        SELECT DISTINCT user_id FROM events
    ),
    conv AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ),
    assigned AS (
        SELECT u.user_id,
               CASE WHEN substr(md5(CAST(u.user_id AS VARCHAR)), 1, 1)
                         < '8' THEN 1 ELSE 0 END AS in_a,
               CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END AS is_conv
        FROM users u LEFT JOIN conv c ON c.user_id = u.user_id
    ),
    agg AS (
        SELECT CAST(SUM(in_a) AS BIGINT) AS n_a,
               CAST(SUM(in_a * is_conv) AS BIGINT) AS c_a,
               CAST(SUM(1 - in_a) AS BIGINT) AS n_b,
               CAST(SUM((1 - in_a) * is_conv) AS BIGINT) AS c_b
        FROM assigned
    )
    SELECT n_a, c_a, n_b, c_b,
           -- an empty variant (every user hashed to one side) makes the
           -- rate 0/0: Spark NULLs it while DuckDB yields nan — define
           -- rate = 0.0 identically in both engines
           CASE WHEN n_a = 0 THEN 0.0
                ELSE CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) END AS rate_a,
           CASE WHEN n_b = 0 THEN 0.0
                ELSE CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS rate_b,
           -- pooled p = 0 or 1 (nobody / everybody converts) makes the
           -- standard error exactly 0; an empty variant makes 1/n
           -- infinite: define z = 0 (no evidence) identically in both
           CASE WHEN n_a = 0 OR n_b = 0
                  OR c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN 0.0
                ELSE (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                      - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                     / sqrt((CAST(c_a + c_b AS DOUBLE)
                             / CAST(n_a + n_b AS DOUBLE))
                            * (1.0 - CAST(c_a + c_b AS DOUBLE)
                                     / CAST(n_a + n_b AS DOUBLE))
                            * (1.0 / CAST(n_a AS DOUBLE)
                               + 1.0 / CAST(n_b AS DOUBLE))) END AS z_score
    FROM agg
    """


@register(
    "events_ab_test_report",
    oracle=AB_TEST_ORACLE,
    doc="A/B experiment report: users assigned to variants by an md5 "
        "hash split (the same content-addressed assignment discipline "
        "as split_train_test — deterministic, join-free, no assignment "
        "table to persist), conversion = any purchase event; reports "
        "per-variant counts/rates and the pooled two-proportion "
        "z-statistic. Two distinct-shuffles on user_id then a 1-row "
        "aggregate; the z's sqrt chain mirrors the oracle's op order "
        "exactly so the double is bit-stable.",
)
def events_ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    conv = (ev.where(F.col("event_type") == "purchase")
            .select("user_id").distinct()
            .withColumn("is_conv", F.lit(1)))
    assigned = (users.join(conv, "user_id", "left")
                .select(
                    F.when(F.substring(F.md5(F.col("user_id")
                                             .cast("string")), 1, 1)
                           < "8", 1).otherwise(0).alias("in_a"),
                    F.coalesce("is_conv", F.lit(0)).alias("is_conv")))
    return ab_test_report_tail(assigned)


def ab_test_report_tail(assigned: DataFrame) -> DataFrame:
    """Variant counts/rates + pooled z from an (in_a, is_conv) frame —
    the report tail the streaming twin must reproduce bit-for-bit from
    its folded per-user state (counts are integers, so the rate and z
    division/sqrt chains agree exactly)."""
    agg = assigned.agg(
        F.sum("in_a").cast("bigint").alias("n_a"),
        F.sum(F.col("in_a") * F.col("is_conv")).cast("bigint").alias("c_a"),
        F.sum(F.lit(1) - F.col("in_a")).cast("bigint").alias("n_b"),
        F.sum((F.lit(1) - F.col("in_a")) * F.col("is_conv"))
        .cast("bigint").alias("c_b"))
    rate_a = F.when(F.col("n_a") == 0, F.lit(0.0)).otherwise(
        F.col("c_a").cast("double") / F.col("n_a").cast("double"))
    rate_b = F.when(F.col("n_b") == 0, F.lit(0.0)).otherwise(
        F.col("c_b").cast("double") / F.col("n_b").cast("double"))
    pooled = ((F.col("c_a") + F.col("c_b")).cast("double")
              / (F.col("n_a") + F.col("n_b")).cast("double"))
    se = F.sqrt(pooled * (F.lit(1.0) - pooled)
                * (F.lit(1.0) / F.col("n_a").cast("double")
                   + F.lit(1.0) / F.col("n_b").cast("double")))
    degenerate = ((F.col("n_a") == 0) | (F.col("n_b") == 0)
                  | (F.col("c_a") + F.col("c_b") == 0)
                  | (F.col("c_a") + F.col("c_b")
                     == F.col("n_a") + F.col("n_b")))
    return agg.select("n_a", "c_a", "n_b", "c_b",
                      rate_a.alias("rate_a"), rate_b.alias("rate_b"),
                      F.when(degenerate, F.lit(0.0))
                      .otherwise((rate_a - rate_b) / se)
                      .alias("z_score"))


# ---------------------------------------------------------------------------
# Sequential pattern rules: "users who do A tend to do B AFTERWARD" —
# the temporal-ordering complement of events_type_affinity (pure
# co-occurrence) and events_markov_transitions (adjacent steps only).
# Semantics: per user, the FIRST occurrence of each event type; the
# pair (a, b) fires when first(a) precedes first(b) under the
# deterministic (ts, event_id) order. Bounded by construction: the
# per-user state is one row per event TYPE (a constant), so pair
# generation is #types^2 per user, never events^2; one groupBy on
# (user, type), one bounded self-join over the compacted firsts.
# ---------------------------------------------------------------------------


@register(
    "events_sequential_patterns",
    oracle="""
    WITH firsts AS (
        SELECT user_id, event_type,
               MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS ord
        FROM events GROUP BY user_id, event_type
    ),
    typ AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM firsts GROUP BY event_type
    ),
    ordered AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_ordered
        FROM firsts a JOIN firsts b
          ON a.user_id = b.user_id
         AND a.event_type <> b.event_type
         AND a.ord < b.ord
        GROUP BY 1, 2
    )
    SELECT o.type_a, o.type_b, o.n_ordered,
           ta.n_users AS n_users_a, tb.n_users AS n_users_b,
           CAST(o.n_ordered AS DOUBLE) / CAST(ta.n_users AS DOUBLE)
               AS confidence
    FROM ordered o
    JOIN typ ta ON ta.event_type = o.type_a
    JOIN typ tb ON tb.event_type = o.type_b
    """,
    doc="sequential pattern rules (A happens before B): per-user FIRST "
        "occurrence micros of each event type, strictly-ordered pair "
        "counts + confidence (timestamp ties count neither direction — "
        "deterministic in both engines) — per-user state is one row "
        "per TYPE (constant), so the self-join is types^2 per user, "
        "never events^2; type tables broadcast",
)
def events_sequential_patterns(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = (ev.select("user_id", "event_type",
                        F.unix_micros("ts").alias("o"))
              .groupBy("user_id", "event_type")
              .agg(F.min("o").alias("ord")))
    typ = firsts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"))
    a = firsts.select("user_id", F.col("event_type").alias("type_a"),
                      F.col("ord").alias("ord_a"))
    b = firsts.select("user_id", F.col("event_type").alias("type_b"),
                      F.col("ord").alias("ord_b"))
    ordered = (a.join(b, "user_id")
               .where((F.col("type_a") != F.col("type_b"))
                      & (F.col("ord_a") < F.col("ord_b")))
               .groupBy("type_a", "type_b")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_ordered")))
    ta = typ.select(F.col("event_type").alias("type_a"),
                    F.col("n_users").alias("n_users_a"))
    tb = typ.select(F.col("event_type").alias("type_b"),
                    F.col("n_users").alias("n_users_b"))
    return (ordered.join(F.broadcast(ta), "type_a")
            .join(F.broadcast(tb), "type_b")
            .select("type_a", "type_b", "n_ordered",
                    "n_users_a", "n_users_b",
                    (F.col("n_ordered").cast("double")
                     / F.col("n_users_a").cast("double"))
                    .alias("confidence")))


@register(
    "events_uplift_by_segment",
    oracle="""
    WITH act AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_buy
        FROM events GROUP BY user_id
    ),
    seg AS (
        SELECT user_id,
               CASE WHEN n_events >= 72 THEN 'heavy'
                    WHEN n_events >= 60 THEN 'mid'
                    ELSE 'light' END AS segment,
               CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         < '8' THEN 1 ELSE 0 END AS in_a,
               CASE WHEN n_buy > 0 THEN 1 ELSE 0 END AS is_conv
        FROM act
    ),
    agg AS (
        SELECT segment,
               CAST(SUM(in_a) AS BIGINT) AS n_a,
               CAST(SUM(in_a * is_conv) AS BIGINT) AS c_a,
               CAST(SUM(1 - in_a) AS BIGINT) AS n_b,
               CAST(SUM((1 - in_a) * is_conv) AS BIGINT) AS c_b
        FROM seg GROUP BY segment
    )
    SELECT segment, n_a, c_a, n_b, c_b,
           CASE WHEN n_a = 0 THEN 0.0
                ELSE CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) END AS rate_a,
           CASE WHEN n_b = 0 THEN 0.0
                ELSE CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS rate_b,
           CASE WHEN n_a = 0 OR n_b = 0
                  OR c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN 0.0
                ELSE (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                      - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                     / sqrt((CAST(c_a + c_b AS DOUBLE)
                             / CAST(n_a + n_b AS DOUBLE))
                            * (1.0 - CAST(c_a + c_b AS DOUBLE)
                                     / CAST(n_a + n_b AS DOUBLE))
                            * (1.0 / CAST(n_a AS DOUBLE)
                               + 1.0 / CAST(n_b AS DOUBLE))) END AS z_score
    FROM agg
    """,
    doc="stratified A/B uplift: the pooled two-proportion z computed "
        "PER ACTIVITY SEGMENT (light/mid/heavy around the per-user "
        "event-count median) — the "
        "Simpson's-paradox guard an experiment readout needs beyond "
        "the corpus-level z; same md5 variant split and degenerate-"
        "case contract as events_ab_test_report, one user_id groupBy "
        "then a segment-count-bounded aggregate",
)
def events_uplift_by_segment(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    act = (ev.groupBy("user_id")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.sum(F.when(F.col("event_type") == "purchase", 1)
                      .otherwise(0)).cast("bigint").alias("n_buy")))
    seg = act.select(
        F.when(F.col("n_events") >= 72, "heavy")
        .when(F.col("n_events") >= 60, "mid")
        .otherwise("light").alias("segment"),
        F.when(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
               < "8", 1).otherwise(0).alias("in_a"),
        F.when(F.col("n_buy") > 0, 1).otherwise(0).alias("is_conv"))
    agg = seg.groupBy("segment").agg(
        F.sum("in_a").cast("bigint").alias("n_a"),
        F.sum(F.col("in_a") * F.col("is_conv")).cast("bigint").alias("c_a"),
        F.sum(F.lit(1) - F.col("in_a")).cast("bigint").alias("n_b"),
        F.sum((F.lit(1) - F.col("in_a")) * F.col("is_conv"))
        .cast("bigint").alias("c_b"))
    rate_a = F.when(F.col("n_a") == 0, F.lit(0.0)).otherwise(
        F.col("c_a").cast("double") / F.col("n_a").cast("double"))
    rate_b = F.when(F.col("n_b") == 0, F.lit(0.0)).otherwise(
        F.col("c_b").cast("double") / F.col("n_b").cast("double"))
    pooled = ((F.col("c_a") + F.col("c_b")).cast("double")
              / (F.col("n_a") + F.col("n_b")).cast("double"))
    se = F.sqrt(pooled * (F.lit(1.0) - pooled)
                * (F.lit(1.0) / F.col("n_a").cast("double")
                   + F.lit(1.0) / F.col("n_b").cast("double")))
    degenerate = ((F.col("n_a") == 0) | (F.col("n_b") == 0)
                  | (F.col("c_a") + F.col("c_b") == 0)
                  | (F.col("c_a") + F.col("c_b")
                     == F.col("n_a") + F.col("n_b")))
    return agg.select("segment", "n_a", "c_a", "n_b", "c_b",
                      rate_a.alias("rate_a"), rate_b.alias("rate_b"),
                      F.when(degenerate, F.lit(0.0))
                      .otherwise((rate_a - rate_b) / se)
                      .alias("z_score"))


@register(
    "events_funnel_dropoff_time",
    oracle="""
    WITH v AS (SELECT user_id, MIN(epoch_us(CAST(ts AS TIMESTAMP)))
                   AS t_view
               FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(epoch_us(CAST(e.ts AS TIMESTAMP)))
              AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click'
            AND epoch_us(CAST(e.ts AS TIMESTAMP)) > v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(epoch_us(CAST(e.ts AS TIMESTAMP)))
              AS t_buy
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase'
            AND epoch_us(CAST(e.ts AS TIMESTAMP)) > c.t_click
          GROUP BY e.user_id),
    gaps AS (
        SELECT 'view_to_click' AS stage,
               c.t_click - v.t_view AS gap_us
        FROM c JOIN v ON v.user_id = c.user_id
        UNION ALL
        SELECT 'click_to_buy' AS stage, p.t_buy - c.t_click AS gap_us
        FROM p JOIN c ON c.user_id = p.user_id
    ),
    ranked AS (
        SELECT stage, gap_us,
               ROW_NUMBER() OVER (PARTITION BY stage ORDER BY gap_us)
                 - 1 AS rn
        FROM gaps
    ),
    cnt AS (
        SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
        FROM gaps GROUP BY stage
    ),
    pick AS (
        SELECT r.stage, c.n_users, c.max_gap_us,
            MAX(CASE WHEN rn = ((n_users - 1) * 5) // 10
                     THEN gap_us END) AS lo5,
            MAX(CASE WHEN rn = LEAST(((n_users - 1) * 5) // 10 + 1,
                                     n_users - 1)
                     THEN gap_us END) AS hi5,
            MAX(CASE WHEN rn = ((n_users - 1) * 9) // 10
                     THEN gap_us END) AS lo9,
            MAX(CASE WHEN rn = LEAST(((n_users - 1) * 9) // 10 + 1,
                                     n_users - 1)
                     THEN gap_us END) AS hi9
        FROM ranked r JOIN cnt c ON c.stage = r.stage
        GROUP BY r.stage, c.n_users, c.max_gap_us
    )
    SELECT stage, n_users,
           CAST(lo5 AS DOUBLE)
             + CAST(((n_users - 1) * 5) % 10 AS DOUBLE) / 10.0
               * CAST(hi5 - lo5 AS DOUBLE) AS p50_gap_us,
           CAST(lo9 AS DOUBLE)
             + CAST(((n_users - 1) * 9) % 10 AS DOUBLE) / 10.0
               * CAST(hi9 - lo9 AS DOUBLE) AS p90_gap_us,
           max_gap_us
    FROM pick
    """,
    doc="funnel latency: median and p90 time between ordered funnel "
        "stages (first view -> first later click -> first later "
        "purchase) — the how-long companion to events_funnel_counts' "
        "how-many. Exact percentiles are computed on BOTH engines as "
        "the same explicit integer-rank interpolation (order "
        "statistics at floor/ceil of (n-1)q, fraction = the integer "
        "remainder over 10), so cross-engine bit-equality holds by "
        "construction for p90 too — not just the dyadic p50 (the r9 "
        "ADVICE gap); every stage one user_id shuffle",
)
def events_funnel_dropoff_time(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min(us).alias("t_view")))
    c = (ev.filter(F.col("event_type") == "click")
         .join(v, "user_id")
         .filter(us > F.col("t_view"))
         .groupBy("user_id").agg(F.min(us).alias("t_click")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter(us > F.col("t_click"))
         .groupBy("user_id").agg(F.min(us).alias("t_buy")))
    gaps = (c.join(v, "user_id")
            .select(F.lit("view_to_click").alias("stage"),
                    (F.col("t_click") - F.col("t_view")).alias("gap_us"))
            .unionByName(
                p.join(c, "user_id")
                .select(F.lit("click_to_buy").alias("stage"),
                        (F.col("t_buy") - F.col("t_click"))
                        .alias("gap_us"))))
    # explicit rank-interpolation percentiles (identical construction
    # in the oracle SQL): index math is all-integer, the fraction is
    # remainder/10.0, and the final double expression is the same op
    # sequence on both engines — bit-equal by construction, no
    # reliance on percentile()/quantile_cont agreeing to the last ulp
    from pyspark.sql import Window

    w = Window.partitionBy("stage").orderBy("gap_us")
    ranked = gaps.withColumn(
        "rn", F.row_number().over(w).cast("bigint") - 1)
    cnt = gaps.groupBy("stage").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"))

    def _at(ix_expr, out):
        return F.max(F.when(F.col("rn") == ix_expr,
                            F.col("gap_us"))).alias(out)

    def _lo_ix(q):
        return F.expr(f"((n_users - 1) * {q}) div 10")

    def _hi_ix(q):
        return F.least(_lo_ix(q) + 1, F.col("n_users") - 1)

    pick = (ranked.join(cnt, "stage")
            .groupBy("stage", "n_users", "max_gap_us")
            .agg(_at(_lo_ix(5), "lo5"), _at(_hi_ix(5), "hi5"),
                 _at(_lo_ix(9), "lo9"), _at(_hi_ix(9), "hi9")))

    def _interp(q, lo, hi):
        frac = (F.expr(f"CAST(((n_users - 1) * {q}) % 10 AS DOUBLE)")
                / F.lit(10.0))
        return (F.col(lo).cast("double")
                + frac * (F.col(hi) - F.col(lo)).cast("double"))

    return pick.select(
        "stage", "n_users",
        _interp(5, "lo5", "hi5").alias("p50_gap_us"),
        _interp(9, "lo9", "hi9").alias("p90_gap_us"),
        "max_gap_us")


# ---------------------------------------------------------------------------
# Time-constrained funnel: the product-analytics funnel where each
# transition must land within a deadline (view -> click within 1h,
# click -> purchase within 1h), vs events_funnel_counts' unconstrained
# ordering. Same scalable shape as the dropoff query — each stage is
# one user_id-keyed join+min — with the deadline as an extra join-side
# filter; rates are single divisions of BIGINT counts.
# ---------------------------------------------------------------------------

_FUNNEL_DEADLINE_US = 3600 * 1_000_000


@register(
    "events_funnel_time_constrained",
    oracle=f"""
    WITH v AS (SELECT user_id, MIN(epoch_us(CAST(ts AS TIMESTAMP)))
                   AS t_view
               FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(epoch_us(CAST(e.ts AS TIMESTAMP)))
              AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click'
            AND epoch_us(CAST(e.ts AS TIMESTAMP)) > v.t_view
            AND epoch_us(CAST(e.ts AS TIMESTAMP))
                <= v.t_view + {_FUNNEL_DEADLINE_US}
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(epoch_us(CAST(e.ts AS TIMESTAMP)))
              AS t_buy
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase'
            AND epoch_us(CAST(e.ts AS TIMESTAMP)) > c.t_click
            AND epoch_us(CAST(e.ts AS TIMESTAMP))
                <= c.t_click + {_FUNNEL_DEADLINE_US}
          GROUP BY e.user_id),
    n AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_click,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_buy
    )
    SELECT stage, n_users, conversion_from_prev FROM (
        SELECT 'view' AS stage, n_view AS n_users,
               1.0 AS conversion_from_prev, 0 AS ord FROM n
        UNION ALL
        SELECT 'click', n_click,
               CASE WHEN n_view = 0 THEN 0.0
                    ELSE CAST(n_click AS DOUBLE) / CAST(n_view AS DOUBLE)
               END, 1 FROM n
        UNION ALL
        SELECT 'purchase', n_buy,
               CASE WHEN n_click = 0 THEN 0.0
                    ELSE CAST(n_buy AS DOUBLE) / CAST(n_click AS DOUBLE)
               END, 2 FROM n
    ) t
    """,
    doc="deadline funnel: first view -> first click within 1h -> first "
        "purchase within a further 1h (the time-boxed conversion "
        "product analytics actually reports, vs the unconstrained "
        "ordered funnel); each stage one user_id join+min with the "
        "deadline as a join-side filter, rates single divisions",
)
def events_funnel_time_constrained(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min(us).alias("t_view")))
    c = (ev.filter(F.col("event_type") == "click")
         .join(v, "user_id")
         .filter((us > F.col("t_view"))
                 & (us <= F.col("t_view") + _FUNNEL_DEADLINE_US))
         .groupBy("user_id").agg(F.min(us).alias("t_click")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter((us > F.col("t_click"))
                 & (us <= F.col("t_click") + _FUNNEL_DEADLINE_US))
         .groupBy("user_id").agg(F.min(us).alias("t_buy")))
    n = (v.agg(F.count(F.lit(1)).cast("bigint").alias("n_view"))
         .join(c.agg(F.count(F.lit(1)).cast("bigint").alias("n_click")))
         .join(p.agg(F.count(F.lit(1)).cast("bigint").alias("n_buy"))))
    view_row = n.select(
        F.lit("view").alias("stage"), F.col("n_view").alias("n_users"),
        F.lit(1.0).alias("conversion_from_prev"))
    click_row = n.select(
        F.lit("click").alias("stage"), F.col("n_click").alias("n_users"),
        F.when(F.col("n_view") == 0, F.lit(0.0))
        .otherwise(F.col("n_click").cast("double")
                   / F.col("n_view").cast("double"))
        .alias("conversion_from_prev"))
    buy_row = n.select(
        F.lit("purchase").alias("stage"), F.col("n_buy").alias("n_users"),
        F.when(F.col("n_click") == 0, F.lit(0.0))
        .otherwise(F.col("n_buy").cast("double")
                   / F.col("n_click").cast("double"))
        .alias("conversion_from_prev"))
    return view_row.unionByName(click_row).unionByName(buy_row)


# ---------------------------------------------------------------------------
# Time-decay attribution: the multi-touch alternative to first-click —
# every click within 24h before a purchase earns credit halving per
# hour of age. Weights are integer powers of two (1 << (23 - age), no
# exp/libm), per-purchase credit shares are floor-quantized to integer
# ppm BEFORE summing (a double sum of rationals would be partition-
# order-dependent), and the report is the credit mass by age bucket —
# the decay curve marketing actually reads. The purchase-click join is
# user-keyed with the 24h window as a join-side filter; per-purchase
# normalization is one groupBy on the purchase id.
# ---------------------------------------------------------------------------

_TD_HOUR_US = 3600 * 1_000_000
_TD_WINDOW_H = 24


@register(
    "events_attribution_time_decay",
    oracle=f"""
    WITH p AS (
        SELECT user_id, event_id AS pid,
               epoch_us(CAST(ts AS TIMESTAMP)) AS pt
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ct
        FROM events WHERE event_type = 'click'
    ),
    pairs AS (
        SELECT p.pid,
               CAST((p.pt - c.ct) // {_TD_HOUR_US} AS BIGINT) AS age_h,
               CAST(1 AS BIGINT)
                   << CAST({_TD_WINDOW_H - 1}
                           - (p.pt - c.ct) // {_TD_HOUR_US} AS BIGINT)
                   AS w
        FROM p JOIN c ON c.user_id = p.user_id
        WHERE c.ct < p.pt
          AND p.pt - c.ct < {_TD_WINDOW_H * _TD_HOUR_US}
    ),
    tot AS (
        SELECT pid, CAST(SUM(w) AS BIGINT) AS tw FROM pairs GROUP BY pid
    )
    SELECT pr.age_h AS age_hours,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(pr.w) AS BIGINT) AS weight_sum,
           CAST(SUM(pr.w * 1000000 // t.tw) AS BIGINT) AS credit_ppm
    FROM pairs pr JOIN tot t ON t.pid = pr.pid
    GROUP BY pr.age_h
    """,
    doc="time-decay multi-touch attribution curve: clicks within 24h "
        "before a purchase earn credit halving per hour of age "
        "(integer 2^(23-age) weights — no exp), per-purchase shares "
        "floor-quantized to ppm before the BIGINT sum so the curve is "
        "engine-order-independent; credit mass and touch counts per "
        "age bucket (bounded 24-row output); user-keyed join with the "
        "window as a join-side filter",
)
def events_attribution_time_decay(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select("user_id", F.col("event_id").alias("pid"),
                 us.alias("pt")))
    c = (ev.filter(F.col("event_type") == "click")
         .select("user_id", us.alias("ct")))
    pairs = (p.join(c, "user_id")
             .where((F.col("ct") < F.col("pt"))
                    & (F.col("pt") - F.col("ct")
                       < _TD_WINDOW_H * _TD_HOUR_US))
             .select("pid",
                     F.expr(f"(pt - ct) div {_TD_HOUR_US}")
                     .cast("bigint").alias("age_h"))
             .withColumn("w", F.expr(
                 f"shiftleft(CAST(1 AS BIGINT), "
                 f"CAST({_TD_WINDOW_H - 1} - age_h AS INT))")))
    tot = pairs.groupBy("pid").agg(
        F.sum("w").cast("bigint").alias("tw"))
    return (pairs.join(tot, "pid")
            .groupBy(F.col("age_h").alias("age_hours"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_touches"),
                 F.sum("w").cast("bigint").alias("weight_sum"),
                 F.sum(F.expr("w * 1000000 div tw")).cast("bigint")
                 .alias("credit_ppm")))


# ---------------------------------------------------------------------------
# Customer tier migration: activity tier (none/light/mid/heavy by
# order count) in the first half of the order-date range vs the
# second — the churn/upgrade flow matrix behind "where did our heavy
# buyers go". The date midpoint is integer day arithmetic from one
# scalar aggregate (broadcast), halves aggregate per customer, and
# the matrix domain is 4x4 — bounded output at any order volume.
# ---------------------------------------------------------------------------


@register(
    "orders_customer_migration_matrix",
    oracle="""
    WITH bounds AS (
        SELECT datediff('day', DATE '1970-01-01', MIN(o_orderdate))
                   AS lo,
               datediff('day', DATE '1970-01-01', MAX(o_orderdate))
                   AS hi
        FROM orders
    ),
    tagged AS (
        SELECT o.o_custkey AS custkey,
               CASE WHEN datediff('day', DATE '1970-01-01', o.o_orderdate)
                         <= (b.lo + b.hi) // 2
                    THEN 1 ELSE 2 END AS half
        FROM orders o CROSS JOIN bounds b
    ),
    per AS (
        SELECT custkey,
               CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN half = 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2
        FROM tagged GROUP BY custkey
    ),
    tiers AS (
        SELECT custkey,
               CASE WHEN n1 = 0 THEN 'none' WHEN n1 = 1 THEN 'light'
                    WHEN n1 <= 3 THEN 'mid' ELSE 'heavy' END AS tier_h1,
               CASE WHEN n2 = 0 THEN 'none' WHEN n2 = 1 THEN 'light'
                    WHEN n2 <= 3 THEN 'mid' ELSE 'heavy' END AS tier_h2
        FROM per
    )
    SELECT tier_h1, tier_h2, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM tiers GROUP BY tier_h1, tier_h2
    """,
    doc="customer activity-tier migration matrix: order-count tier "
        "(none/light/mid/heavy) in the first vs second half of the "
        "order-date range — the upgrade/churn flow behind a moving "
        "revenue curve; midpoint from one broadcast scalar aggregate, "
        "per-customer conditional sums, 4x4 bounded output",
)
def orders_customer_migration_matrix(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff("o_orderdate", F.lit("1970-01-01").cast("date"))
        .alias("d"))
    bounds = o.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    tagged = (o.join(F.broadcast(bounds))
              .select("o_custkey",
                      F.when(F.col("d") <= F.expr("(lo + hi) div 2"), 1)
                      .otherwise(2).alias("half")))
    per = (tagged.groupBy(F.col("o_custkey").alias("custkey"))
           .agg(F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
                .cast("bigint").alias("n1"),
                F.sum(F.when(F.col("half") == 2, 1).otherwise(0))
                .cast("bigint").alias("n2")))

    def tier(c):
        return (F.when(F.col(c) == 0, "none")
                .when(F.col(c) == 1, "light")
                .when(F.col(c) <= 3, "mid").otherwise("heavy"))

    return (per.select(tier("n1").alias("tier_h1"),
                       tier("n2").alias("tier_h2"))
            .groupBy("tier_h1", "tier_h2")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers")))
