"""events.ts canonicalization contract.

The source file stores ts as TIMESTAMP(NANOS), which different Spark
versions decode differently (long under nanosAsLong on <= 4.0,
TIMESTAMP_NTZ on >= 4.1 — the latter broke every unix_micros call site
when the runtime upgraded). These tests pin the invariants every
downstream query relies on, so the next decoder change fails here
first instead of in 30 registered queries.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from iq_to_hdl_migration_spark.sources.tables import load_table, table_path


def test_ts_is_plain_timestamp(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_unix_micros_works_and_matches_duckdb(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = sorted(
        r.us for r in
        ev.select(F.unix_micros("ts").alias("us")).limit(50)
        .collect())
    # limit(50) on an unordered scan isn't deterministic; compare the
    # full min/max + a checksum over ALL rows instead
    # the checksum SUM must be wider than int64: each unix_micros value
    # is ~1.7e15, so past ~5k rows (sf0.01 events has 10k) an int64 sum
    # overflows and ANSI mode throws — cast both engines to decimal/
    # HUGEINT so the test holds at any sf
    spark_stats = ev.select(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
        F.sum(F.unix_micros("ts").cast("decimal(38,0)")).alias("s")
    ).collect()[0]
    duck = duckdb.sql(
        f"""SELECT min(epoch_us(CAST(ts AS TIMESTAMP))),
                   max(epoch_us(CAST(ts AS TIMESTAMP))),
                   sum(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS HUGEINT))
            FROM read_parquet('{table_path(sf_dir, "events")}')"""
    ).fetchone()
    assert (spark_stats.lo, spark_stats.hi, int(spark_stats.s)) == \
        (duck[0], duck[1], int(duck[2]))
    assert len(got) == 50


def test_normalize_is_identity_on_canonical_frames(spark, sf_dir):
    from iq_to_hdl_migration_spark.sources.tables import normalize_event_ts
    ev = load_table(spark, sf_dir, "events")
    again = normalize_event_ts(ev)
    assert dict(again.dtypes)["ts"] == "timestamp"
    assert again.schema == ev.schema


def test_normalize_ntz_is_session_tz_independent(spark):
    """The NTZ branch must yield the SAME epoch micros under any
    session timezone (the implicit NTZ->LTZ cast and the
    to_utc_timestamp(.., current_timezone()) shift cancel). A literal
    'UTC' second argument silently shifted every timestamp by the
    session offset — regression for the round-4 advice item."""
    from iq_to_hdl_migration_spark.sources.tables import normalize_event_ts

    ntz = spark.createDataFrame(
        [("2024-03-15 12:34:56.789012",)], "s string").select(
        F.col("s").cast("timestamp_ntz").alias("ts"))
    tz_conf = "spark.sql.session.timeZone"
    saved = spark.conf.get(tz_conf)
    got = {}
    try:
        for tz in ("UTC", "America/Los_Angeles", "Asia/Tokyo"):
            spark.conf.set(tz_conf, tz)
            got[tz] = normalize_event_ts(ntz).select(
                F.unix_micros("ts")).collect()[0][0]
    finally:
        spark.conf.set(tz_conf, saved)
    # naive wall-clock read as UTC
    import datetime as dt
    want = int(dt.datetime(2024, 3, 15, 12, 34, 56, 789012,
                           tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    assert got == {tz: want for tz in got}
