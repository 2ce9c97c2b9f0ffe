"""Corpus-level hygiene operators for LLM training data (SURVEY
§2.11): vocabulary statistics, benchmark-decontamination scanning, and
burst/bot detection — plus the basket-size distribution on the
relational side.

Scale notes:
- `text_vocab_stats` explodes tokens once and aggregates per source:
  total tokens (map-side partial count) and distinct tokens (one
  shuffle on the (source, token) pair, then count per source). At
  100 TB the (source, token) key is high-cardinality and uniform —
  exactly what a shuffle wants; nothing collects a vocabulary to the
  driver.
- `text_contamination_scan` holds the probe set as a literal array
  (the real deployment broadcasts a small probe table); the scan is a
  single pass with `exists()` over the probes per document — no join,
  no regex catastrophes, pushdown-friendly.
- `events_burst_users` aggregates to (user, minute) first — bounded by
  time-grain, immune to per-event skew — then takes a per-user max.
- Determinism: counts/ratios are exact integers with one final double
  division.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iq_to_hdl_migration_spark.queries import register
from iq_to_hdl_migration_spark.sources.tables import load_table

_TOKS_SPARK = r"split(lower(trim(text)), '\\s+')"
_TOKS_DUCK = r"string_split_regex(lower(trim(text)), '\s+')"

# benchmark-probe strings for the decontamination scan (stand-ins for
# eval-set shingles; the real pipeline loads these from a probe table)
_PROBES = ["sort merge", "hash join", "window frame", "broadcast nested"]
_PROBES_SPARK = "array(" + ", ".join(f"'{p}'" for p in _PROBES) + ")"
_PROBES_DUCK = "[" + ", ".join(f"'{p}'" for p in _PROBES) + "]"


@register(
    "text_vocab_stats",
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest({_TOKS_DUCK}) AS token FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT token) AS BIGINT) AS distinct_tokens,
           CAST(COUNT(DISTINCT token) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS type_token_ratio
    FROM tok GROUP BY source
    """,
    doc="Per-source vocabulary statistics (total/distinct tokens, "
        "type-token ratio) — distributed distinct on the (source, "
        "token) shuffle key, no driver-side vocabulary. SURVEY §2.11 "
        "text analysis.",
)
def text_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.expr(_TOKS_SPARK)).alias("token"))
    return tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("total_tokens"),
        F.countDistinct("token").cast("bigint").alias("distinct_tokens"),
        (F.countDistinct("token").cast("double")
         / F.count(F.lit(1)).cast("double")).alias("type_token_ratio"),
    )


@register(
    "text_contamination_scan",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN len(list_filter({_PROBES_DUCK},
                        p -> contains(lower(text), p))) > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           CAST(SUM(len(list_filter({_PROBES_DUCK},
                        p -> contains(lower(text), p)))) AS BIGINT)
               AS n_probe_hits
    FROM documents GROUP BY source
    """,
    doc="Benchmark-decontamination scan: per source, documents "
        "containing any probe string and total probe hits. Probe set "
        "is a broadcast-style literal array checked with contains() in "
        "one pass — no join, no regex. SURVEY §2.11 text analysis.",
)
def text_contamination_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hits = F.expr(
        f"size(filter({_PROBES_SPARK}, p -> contains(lower(text), p)))")
    d = docs.select("source", hits.alias("hits"))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("hits") > 0, 1).otherwise(0)).cast("bigint")
            .alias("n_contaminated"),
        F.sum("hits").cast("bigint").alias("n_probe_hits"),
    )


@register(
    "events_burst_users",
    oracle="""
    WITH pm AS (
        SELECT user_id, date_trunc('minute', ts) AS minute,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ), mx AS (
        SELECT user_id, MAX(n) AS peak_per_minute FROM pm GROUP BY user_id
    )
    SELECT CAST(peak_per_minute AS BIGINT) AS peak_per_minute,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM mx GROUP BY peak_per_minute
    """,
    doc="Burst/bot detection histogram: per-user peak events-per-minute "
        "(grain-first aggregation bounds state by time grain, not "
        "event volume). SURVEY §2.11 data quality.",
)
def events_burst_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pm = (ev.groupBy("user_id", F.date_trunc("minute", "ts").alias("minute"))
          .agg(F.count(F.lit(1)).alias("n")))
    mx = pm.groupBy("user_id").agg(F.max("n").alias("peak_per_minute"))
    return (mx.groupBy("peak_per_minute")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
            .select(F.col("peak_per_minute").cast("bigint")
                    .alias("peak_per_minute"), "n_users"))


@register(
    "orders_basket_size_distribution",
    oracle="""
    WITH b AS (
        SELECT l_orderkey, COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
                    AS DECIMAL(18,2)) AS total_qty
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(n_lines AS BIGINT) AS n_lines,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(total_qty) AS DOUBLE) AS sum_qty,
           CAST(SUM(total_qty) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS avg_qty_per_order
    FROM b GROUP BY n_lines
    """,
    doc="Basket-size distribution: lines-per-order histogram with "
        "exact-decimal quantity rollup; two shuffles on shrinking keys "
        "(orderkey -> n_lines). SURVEY §2.11.",
)
def orders_basket_size_distribution(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    b = (li.groupBy("l_orderkey")
         .agg(F.count(F.lit(1)).alias("n_lines"),
              F.sum(F.col("l_quantity").cast("decimal(12,2)"))
                  .cast("decimal(18,2)").alias("total_qty")))
    return (b.groupBy("n_lines")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                 F.sum("total_qty").cast("double").alias("sum_qty"),
                 (F.sum("total_qty").cast("double")
                  / F.count(F.lit(1)).cast("double"))
                     .alias("avg_qty_per_order"))
            .select(F.col("n_lines").cast("bigint").alias("n_lines"),
                    "n_orders", "sum_qty", "avg_qty_per_order"))


@register(
    "text_df_histogram",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT doc_id, unnest({_TOKS_DUCK}) AS token
        FROM documents
    ), df AS (
        SELECT token, COUNT(*) AS doc_freq FROM tok GROUP BY token
    )
    SELECT CAST(doc_freq AS BIGINT) AS doc_freq,
           CAST(COUNT(*) AS BIGINT) AS n_tokens
    FROM df GROUP BY doc_freq
    """,
    doc="Document-frequency histogram (inverted-index posting-list "
        "sizing evidence): distinct (doc, token) -> per-token doc "
        "frequency -> histogram. Three shuffles on shrinking keys; "
        "the heavy one is the uniform (doc_id, token) distinct. "
        "SURVEY §2.11 text analysis.",
)
def text_df_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = (docs.select("doc_id", F.explode(F.expr(_TOKS_SPARK)).alias("token"))
           .distinct())
    df = tok.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    return (df.groupBy("doc_freq")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"))
            .select(F.col("doc_freq").cast("bigint").alias("doc_freq"),
                    "n_tokens"))


@register(
    "lineitem_discount_curve",
    oracle="""
    SELECT CAST(ROUND(CAST(l_discount AS DECIMAL(4,2)) * 100)
                AS INTEGER) AS discount_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS revenue
    FROM lineitem GROUP BY 1
    """,
    doc="Discount-effectiveness curve: per discount level, line count, "
        "average quantity (does discounting move volume?) and realized "
        "revenue — single scan, constant-size group key. SURVEY §2.11.",
)
def lineitem_discount_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_discount").cast("decimal(4,2)")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (F.lit(1) - disc)
    return (li.groupBy(F.round(disc * 100).cast("int").alias("discount_pct"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"),
                 (F.sum(qty).cast("double")
                  / F.count(F.lit(1)).cast("double")).alias("avg_qty"),
                 F.sum(rev).cast("double").alias("revenue")))
