"""Event-stream analytics over `events` (batch form; the streaming
variants with watermarks live in `streaming/` and are locked by their
own tests — SURVEY §2.10 notes the reference has no streaming at all).

The `ts` column is stored as TIMESTAMP(NANOS); `load_table` normalizes
to microsecond timestamps, and every oracle applies the identical
`CAST(ts AS TIMESTAMP)` truncation on DuckDB's TIMESTAMP_NS. Time math
uses exact integer microseconds (`unix_micros` / `epoch_us`) so both
engines agree bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from iq_to_hdl_migration_spark.queries import register
from iq_to_hdl_migration_spark.sources.tables import load_table

_GAP_US = 1800 * 1_000_000  # 30-minute session gap


@register(
    "events_hourly_by_type",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', CAST(ts AS TIMESTAMP)), event_type
    """,
    doc="tumbling 1h window aggregation per event type (batch form of "
        "the streaming windowed agg)",
    bench=True,
)
def events_hourly_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("hour_ts", F.date_trunc("hour", F.col("ts")))
        .groupBy("hour_ts", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(14,2)"))
             .cast("double").alias("total_value"))
    )


@register(
    "events_sessionization",
    oracle=f"""
    WITH o AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        FROM events
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us > {_GAP_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS DOUBLE) /
               CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us > {_GAP_US}
                             THEN 1 ELSE 0 END) AS DOUBLE)
               AS avg_session_events
    FROM o GROUP BY user_id
    """,
    doc="gap-based sessionization (30 min) via lag window — the batch "
        "twin of the streaming stateful session operator",
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    is_new = F.when(prev.isNull() | ((us - prev) > _GAP_US), 1).otherwise(0)
    per_event = ev.select("user_id", is_new.alias("is_new"))
    return (
        per_event.groupBy("user_id")
        .agg(F.sum("is_new").cast("bigint").alias("n_sessions"),
             F.count(F.lit(1)).alias("n_events"))
        .withColumn("avg_session_events",
                    F.col("n_events").cast("double")
                    / F.col("n_sessions").cast("double"))
    )


@register(
    "events_json_extract",
    oracle=r"""
    SELECT event_type,
           CAST(SUM(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER))
                AS BIGINT) AS sum_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="semi-structured props extraction (regex on JSON — portable "
        "across engines; Spark-side get_json_object is equivalent)",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("int")
    return (
        ev.groupBy("event_type")
        .agg(F.sum(k).cast("bigint").alias("sum_k"),
             F.count(F.lit(1)).alias("n"))
    )


@register(
    "events_user_topk",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY n_events DESC, user_id
    LIMIT 20
    """,
    doc="top-k active users (group + deterministic top-k)",
)
def events_user_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(14,2)"))
             .cast("double").alias("total_value"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(20)
    )


@register(
    "events_error_rate_hourly",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_errors,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS error_rate
    FROM events
    GROUP BY date_trunc('hour', CAST(ts AS TIMESTAMP))
    """,
    doc="per-window error-rate monitoring (conditional aggregation)",
)
def events_error_rate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    is_err = F.when(F.col("event_type") == "error", 1).otherwise(0)
    return (
        ev.withColumn("hour_ts", F.date_trunc("hour", F.col("ts")))
        .groupBy("hour_ts")
        .agg(F.count(F.lit(1)).alias("n_total"),
             F.sum(is_err).cast("bigint").alias("n_errors"),
             (F.sum(is_err).cast("double") / F.count(F.lit(1)).cast("double"))
             .alias("error_rate"))
    )


@register(
    "events_sliding_hourly",
    oracle="""
    SELECT window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM (
        SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
                   AS window_start, event_type
        FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
                   - INTERVAL '30 minutes', event_type
        FROM events
    ) t
    GROUP BY window_start, event_type
    """,
    doc="sliding 1h window, 30m slide: each event lands in exactly two "
        "windows (starts floor_30(t) and floor_30(t)-30m) — the oracle "
        "expresses the same assignment as two shifted tumbling grids",
)
def events_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"),
                   "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type",
                "n_events")
    )
