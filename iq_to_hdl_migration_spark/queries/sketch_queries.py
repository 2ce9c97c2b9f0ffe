"""Sketch-based approximate aggregates — the 100-TB substitutes for
exact DISTINCT/percentile when the exact answer would shuffle the
whole key domain:

* HLL (Apache DataSketches via `hll_sketch_agg`) — mergeable distinct
  sketches: pre-aggregate per day, re-aggregate to month by sketch
  UNION without touching raw rows again.  Map-side partial sketches
  mean the shuffle carries ~1.5 KB per group instead of the key set.
* `approx_percentile` — bounded-error quantiles in one pass.

These are rows-only registry entries (DuckDB's approx sketches are a
different algorithm, so value-hash comparison is meaningless); their
semantics are locked by unit tests against exact answers with error
bounds, plus the lossless-merge identity (union of per-day sketches ==
one-shot sketch at equal precision).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iq_to_hdl_migration_spark.queries import register
from iq_to_hdl_migration_spark.sources.tables import load_table

_LGK = 14  # HLL precision: ~0.5% relative standard error


@register(
    "sketch_distinct_users_daily",
    oracle=None,
    doc="per-(day, event_type) HLL distinct-user estimate; at scale this "
        "replaces countDistinct's full key shuffle with fixed-size "
        "sketch partials",
)
def sketch_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.to_date("ts"))
        .groupBy("day", "event_type")
        .agg(F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id"), F.lit(_LGK)))
            .alias("approx_users"))
    )


@register(
    "sketch_distinct_users_rollup",
    oracle=None,
    doc="two-level sketch rollup: daily HLL sketches UNION-merged to a "
        "per-type monthly distinct WITHOUT rescanning raw events — the "
        "incremental-rollup pattern a 100 TB hypertable needs",
)
def sketch_distinct_users_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.withColumn("day", F.to_date("ts"))
        .groupBy("day", "event_type")
        .agg(F.hll_sketch_agg(F.col("user_id"), F.lit(_LGK)).alias("sk"))
    )
    return (
        daily.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg(F.col("sk")))
             .alias("approx_users"),
             F.count(F.lit(1)).alias("n_days"))
    )


@register(
    "sketch_value_percentiles",
    # approx_percentile(accuracy=10000) degrades to EXACT order
    # statistics while each group holds < accuracy rows — true at every
    # gate scale (sf0.01 events: ~2.5k rows/type) — and Spark's exact
    # rank convention equals DuckDB's quantile_disc (verified
    # value-identical at sf0.001 and sf0.01). Past the accuracy
    # threshold the sketch's documented error bound takes over and the
    # comparison would need a tolerance, not equality — oracle_max_sf
    # gates the equality check to scales below that threshold (the 5x
    # smoke data at ~12.5k rows/type would false-fail on a query
    # behaving exactly as documented).
    oracle_max_sf=0.02,
    oracle="""
    SELECT event_type,
           quantile_disc(value, 0.5) AS p50,
           quantile_disc(value, 0.95) AS p95,
           quantile_disc(value, 0.99) AS p99
    FROM events GROUP BY event_type
    """,
    doc="one-pass approx_percentile(p50/p95/p99) of event value per "
        "type — bounded-error quantiles without a global sort",
)
def sketch_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pcts = F.approx_percentile(
        F.col("value").cast("double"),
        F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)),
        F.lit(10000))
    return (
        ev.groupBy("event_type")
        .agg(pcts.alias("p"))
        .select("event_type",
                F.col("p").getItem(0).alias("p50"),
                F.col("p").getItem(1).alias("p95"),
                F.col("p").getItem(2).alias("p99"))
    )
