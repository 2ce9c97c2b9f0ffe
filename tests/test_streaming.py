"""Streaming twins must agree with their batch counterparts — the
semantics contract (SURVEY §2.10 streaming plan)."""

from __future__ import annotations

from iq_to_hdl_migration_spark.queries import load_all
from iq_to_hdl_migration_spark.streaming import windows as W

REGISTRY = load_all()


def test_streaming_hourly_matches_batch(spark, sf_dir):
    stream = W.streaming_hourly_counts(spark, sf_dir, "t_hourly").collect()
    batch = REGISTRY["events_hourly_by_type"].fn(spark, sf_dir).collect()
    s = {(r.hour_ts, r.event_type): r.n_events for r in stream}
    b = {(r.hour_ts, r.event_type): r.n_events for r in batch}
    assert s == b and len(s) > 0


def test_streaming_sessionization_matches_batch(spark, sf_dir):
    stream = W.streaming_sessionization(spark, sf_dir, "t_sess").collect()
    batch = REGISTRY["events_sessionization"].fn(spark, sf_dir).collect()
    s = {r.user_id: (r.n_sessions, r.n_events) for r in stream}
    b = {r.user_id: (r.n_sessions, r.n_events) for r in batch}
    assert s == b and len(s) > 0


def test_streaming_dedup_matches_batch_distinct(spark, sf_dir):
    from iq_to_hdl_migration_spark.sources.tables import load_table
    from iq_to_hdl_migration_spark.streaming.windows import (
        streaming_dedup_count)
    streamed = streaming_dedup_count(spark, sf_dir)
    batch = load_table(spark, sf_dir, "events").dropDuplicates(["event_id"])
    assert streamed.count() == batch.count()
    assert streamed.select("event_id").distinct().count() == streamed.count()
