"""Streaming twins must agree with their batch counterparts — the
semantics contract (SURVEY §2.10 streaming plan)."""

from __future__ import annotations

import pyspark.sql.functions as F

from iq_to_hdl_migration_spark.queries import load_all
from iq_to_hdl_migration_spark.streaming import windows as W

REGISTRY = load_all()


def test_streaming_hourly_matches_batch(spark, sf_dir):
    import pyspark.sql.functions as F

    # compare on epoch micros server-side: collecting a raw TIMESTAMP
    # renders it in the client OS timezone (round-5 TZ sweep finding)
    stream = (W.streaming_hourly_counts(spark, sf_dir, "t_hourly")
              .select(F.unix_micros("hour_ts").alias("hour_us"),
                      "event_type", "n_events").collect())
    batch = REGISTRY["events_hourly_by_type"].fn(spark, sf_dir).collect()
    s = {(r.hour_us, r.event_type): r.n_events for r in stream}
    b = {(r.hour_us, r.event_type): r.n_events for r in batch}
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


def test_checkpoint_resume_exactly_once(spark, sf_dir, tmp_path):
    """Two-phase arrival with a re-send of old rows: the second run
    resumes from the checkpoint, emits only the genuinely-new rows,
    and the sink ends with zero duplicates."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    from iq_to_hdl_migration_spark.sources.tables import load_table
    raw = load_table(spark, sf_dir, "events")
    split_id = raw.approxQuantile("event_id", [0.5], 0.0)[0]
    phase1 = raw.filter(F.col("event_id") <= split_id)
    phase2_new = raw.filter(F.col("event_id") > split_id)

    phase1.write.mode("append").parquet(src)
    W.incremental_dedup_to_parquet(spark, src, sink, ckpt)
    n1 = spark.read.parquet(sink).count()
    assert n1 == phase1.count()

    # phase 2: new rows plus a re-send of 100 old (already-sunk) rows —
    # the resumed watermark/dedup state must reject the re-sends
    phase2_new.write.mode("append").parquet(src)
    phase1.limit(100).write.mode("append").parquet(src)
    W.incremental_dedup_to_parquet(spark, src, sink, ckpt)

    out = spark.read.parquet(sink)
    assert out.count() == raw.count()                      # no loss
    assert out.select("event_id").distinct().count() == raw.count()  # no dupes


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Stream-stream interval join == the same predicate as a batch
    join (every purchase x same-user clicks in the prior hour)."""
    import pyspark.sql.functions as F
    from iq_to_hdl_migration_spark.sources.tables import load_table

    got = W.streaming_purchase_click_join(spark, sf_dir)

    ev = load_table(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", "event_id", "ts"))
    want = purchases.join(
        clicks,
        F.expr("user_id = c_user AND "
               "ts BETWEEN click_ts AND click_ts + INTERVAL 1 HOUR"))

    assert got.count() == want.count()
    key = lambda r: (r["event_id"], r["click_id"])
    assert (sorted(map(key, got.collect()))
            == sorted(map(key, want.select("event_id", "click_id").collect())))


def test_streaming_incremental_dedup_equals_batch(spark, sf_dir):
    """The micro-batched incremental dedup (foreachBatch over an
    arrival stream, index extended per batch) must emit EXACTLY the
    single-shot batch result — pair set and estimates — regardless of
    micro-batch partitioning (3 files here vs one batch)."""
    from iq_to_hdl_migration_spark.queries import load_all

    reg = load_all()
    got = sorted(
        tuple(r) for r in
        reg["stream_incremental_dedup"].fn(spark, sf_dir).collect())
    want = sorted(
        tuple(r) for r in
        reg["dedup_incremental_pairs"].fn(spark, sf_dir)
        .select("id_a", "id_b", "est_jaccard").collect())
    assert got == want and len(got) > 0


def test_tws_user_spend_equals_batch(spark, sf_dir):
    """transformWithStateInPandas twin == batch per-user purchase
    totals. Skips where the protobuf runtime the state server needs is
    absent (this container); runs on a full install."""
    import pytest

    if not W.tws_available():
        pytest.skip("protobuf runtime absent: transformWithState "
                    "state server cannot start in this container")
    import pyspark.sql.functions as F
    from iq_to_hdl_migration_spark.sources.tables import load_table

    got = sorted(map(tuple, W.streaming_user_spend_tws(spark, sf_dir)
                     .collect()))
    ev = load_table(spark, sf_dir, "events")
    want = sorted(map(tuple, (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").cast("bigint").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_purchases"),
             F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
             .cast("bigint").alias("spend_cents"))).collect()))
    assert got == want


def test_scd2_state_survives_restart(spark, sf_dir, tmp_path):
    """The CDC contract: land half the events, drain, STOP; land the
    rest, drain again over the SAME checkpoint. Per-user open runs
    must carry across the restart in state, so the union of both
    drains' closed rows equals the batch SCD2 history's closed rows
    over the full dataset — no duplicates, no holes at the seam."""
    import pyspark.sql.functions as F

    from iq_to_hdl_migration_spark.queries import load_all
    from iq_to_hdl_migration_spark.sources.tables import load_table
    from iq_to_hdl_migration_spark.streaming.windows import scd2_stream

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props")
    split_us = ev.agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP "
               "(ORDER BY unix_micros(ts))")).collect()[0][0]
    land = tmp_path / "land"
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    schema = ev.schema

    def drain():
        stream = (spark.readStream.schema(schema)
                  .option("recursiveFileLookup", "true")
                  .parquet(str(land)))
        q = (scd2_stream(stream)
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    (ev.where(F.unix_micros("ts") <= split_us)
     .coalesce(1).write.parquet(str(land / "batch1")))
    drain()
    n_first = spark.read.parquet(sink).count()
    (ev.where(F.unix_micros("ts") > split_us)
     .coalesce(1).write.parquet(str(land / "batch2")))
    drain()

    got = spark.read.parquet(sink)
    n_total = got.count()
    assert 0 < n_first < n_total, "both drains must emit closed rows"

    batch = (load_all()["scd2_user_type_history"].fn(spark, sf_dir)
             .where(F.col("valid_to_us").isNotNull())
             .select("user_id", "version", "event_type",
                     "valid_from_us", "valid_to_us", "n_events"))
    sym_diff = (got.select(*batch.columns).exceptAll(batch)
                .unionAll(batch.exceptAll(got.select(*batch.columns))))
    assert sym_diff.count() == 0, \
        "restarted streaming history must equal the batch history"


def test_bottomk_snapshot_survives_restart(spark, sf_dir, tmp_path):
    """Two separate stream starts over one checkpoint: half the corpus
    arrives, the stream drains and STOPS; the rest arrives and a fresh
    start resumes from the checkpoint. The final snapshot must equal
    the single-shot batch bottom-k over the whole corpus — the
    snapshot chain, not the process, is the state."""
    import os

    import pyspark.sql.functions as F

    from iq_to_hdl_migration_spark.sources.tables import load_table

    k = 5
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.col("doc_id").cast("bigint").alias("doc_id"),
        F.expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), "
               "16, 10) AS BIGINT)").alias("hv"))
    arrivals = str(tmp_path / "arrivals")
    snaps = str(tmp_path / "snaps")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(arrivals)
    os.makedirs(snaps)
    docs.limit(0).write.parquet(os.path.join(snaps, "00000_init"))

    cut = docs.agg(F.expr("CAST(max(doc_id) / 2 AS BIGINT)")).first()[0]

    def arrive(df, name, mtime):
        tmp = str(tmp_path / f"slice_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.startswith("part-"))
        dst = os.path.join(arrivals, f"{name}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    arrive(docs.where(F.col("doc_id") <= cut), "arr_000", 1_000_000)
    W.run_bottomk_fold(spark, arrivals, snaps, ckpt, k)
    mid = sorted(os.listdir(snaps))[-1]
    assert mid != "00000_init", "first drain must write a snapshot"

    arrive(docs.where(F.col("doc_id") > cut), "arr_001", 1_000_001)
    W.run_bottomk_fold(spark, arrivals, snaps, ckpt, k)  # resumes

    final = spark.read.parquet(
        os.path.join(snaps, sorted(os.listdir(snaps))[-1]))
    from pyspark.sql import Window
    w = Window.partitionBy("lang").orderBy("hv", "doc_id")
    expect = (docs.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") <= k).drop("_rn"))
    got = sorted(tuple(r) for r in final.collect())
    want = sorted(tuple(r) for r in expect.collect())
    assert got == want, "restarted fold must equal the batch sample"


def test_basket_fold_survives_restart(spark, sf_dir, tmp_path):
    """Additive-support restart contract: half the ORDERS arrive (whole
    baskets — the atomicity the fold requires), the stream drains and
    STOPS; the rest arrives and a fresh start resumes from the same
    checkpoint. The folded supports must equal the single-shot batch
    supports over all orders — sums across disjoint order sets, no
    double counting at the seam."""
    import os

    import pyspark.sql.functions as F

    from iq_to_hdl_migration_spark.queries.cooccurrence_queries import (
        basket_pair_supports)
    from iq_to_hdl_migration_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    arrivals = str(tmp_path / "arrivals")
    snaps = str(tmp_path / "snaps")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(arrivals)
    os.makedirs(snaps)
    spark.createDataFrame(
        [], "part_a bigint, part_b bigint, n bigint"
    ).write.parquet(os.path.join(snaps, "00000_init"))

    cut = li.agg(F.expr("CAST(max(l_orderkey) / 2 AS BIGINT)")).first()[0]

    def arrive(df, name, mtime):
        tmp = str(tmp_path / f"slice_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.startswith("part-"))
        dst = os.path.join(arrivals, f"{name}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    arrive(li.where(F.col("l_orderkey") <= cut), "arr_000", 1_000_000)
    W.run_basket_fold(spark, arrivals, snaps, ckpt)
    assert sorted(os.listdir(snaps))[-1] != "00000_init"

    arrive(li.where(F.col("l_orderkey") > cut), "arr_001", 1_000_001)
    W.run_basket_fold(spark, arrivals, snaps, ckpt)  # resumes

    snap = spark.read.parquet(
        os.path.join(snaps, sorted(os.listdir(snaps))[-1]))
    got_pairs = sorted(
        tuple(r) for r in snap.where(F.col("part_b").isNotNull())
        .select("part_a", "part_b", "n").collect())
    baskets = (li.groupBy("l_orderkey")
               .agg(F.sort_array(F.collect_set("l_partkey"))
                    .alias("parts")))
    want_pairs = sorted(
        tuple(r) for r in basket_pair_supports(baskets)
        .select("part_a", "part_b", F.col("n_ab").alias("n")).collect())
    assert got_pairs == want_pairs, (
        "restarted fold's pair supports must equal the batch supports")
    tot = snap.where(F.col("part_a").isNull()
                     & F.col("part_b").isNull()).collect()
    assert len(tot) == 1 and tot[0]["n"] == baskets.count(), (
        "order total must fold additively across the restart seam")


def test_ab_test_fold_survives_restart(spark, sf_dir, tmp_path):
    """OR-monoid restart contract: the first half of EVENTS arrives
    (users' purchases may sit in either half), the stream drains and
    STOPS; the rest arrives and a fresh start resumes from the same
    checkpoint. The folded per-user conversion state must equal the
    single-shot batch per-user state — max(is_conv) across the seam,
    no user lost or double-toggled."""
    import os

    import pyspark.sql.functions as F

    from iq_to_hdl_migration_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type")
    arrivals = str(tmp_path / "arrivals")
    snaps = str(tmp_path / "snaps")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(arrivals)
    os.makedirs(snaps)
    spark.createDataFrame(
        [], "user_id bigint, is_conv int"
    ).write.parquet(os.path.join(snaps, "00000_init"))

    cut = ev.agg(F.expr("CAST(max(event_id) / 2 AS BIGINT)")).first()[0]

    def arrive(df, name, mtime):
        tmp = str(tmp_path / f"slice_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.startswith("part-"))
        dst = os.path.join(arrivals, f"{name}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    arrive(ev.where(F.col("event_id") <= cut), "arr_000", 1_000_000)
    W.run_ab_test_fold(spark, arrivals, snaps, ckpt)
    assert sorted(os.listdir(snaps))[-1] != "00000_init"

    arrive(ev.where(F.col("event_id") > cut), "arr_001", 1_000_001)
    W.run_ab_test_fold(spark, arrivals, snaps, ckpt)  # resumes

    snap = spark.read.parquet(
        os.path.join(snaps, sorted(os.listdir(snaps))[-1]))
    got = sorted(tuple(r) for r in snap.collect())
    want = sorted(tuple(r) for r in
                  ev.groupBy("user_id")
                  .agg(F.max(F.when(F.col("event_type") == "purchase", 1)
                             .otherwise(0)).cast("int").alias("is_conv"))
                  .collect())
    assert got == want, (
        "restarted fold's per-user conversion state must equal batch")


def test_boilerplate_gate_fold_survives_restart(spark, sf_dir, tmp_path):
    """Additive kept-count restart contract for the boilerplate gate:
    half the DOCUMENTS arrive (whole docs), the stream drains and
    STOPS; the rest arrives and a fresh start resumes from the same
    checkpoint. The folded per-source kept counts must equal the
    single-shot batch gate over all documents."""
    import os

    import pyspark.sql.functions as F

    from iq_to_hdl_migration_spark.queries.corpus_queries import (
        _BP_MIN_DOCS, _BP_N, _TOKS_SPARK)
    from iq_to_hdl_migration_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text")
    gs = (f"CASE WHEN size(t) >= {_BP_N} THEN "
          f"array_distinct(transform(sequence(1, size(t) - {_BP_N} + 1), "
          f"i -> concat_ws(' ', slice(t, i, {_BP_N})))) "
          f"ELSE array() END")
    boiler = (docs.select("doc_id", F.expr(_TOKS_SPARK).alias("t"))
              .withColumn("gs", F.expr(gs))
              .select("doc_id", F.explode_outer("gs").alias("g"))
              .where(F.col("g").isNotNull())
              .groupBy("g").agg(F.countDistinct("doc_id").alias("c"))
              .where(F.col("c") >= _BP_MIN_DOCS)
              .select("g").localCheckpoint())

    arrivals = str(tmp_path / "arrivals")
    snaps = str(tmp_path / "snaps")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(arrivals)
    os.makedirs(snaps)
    spark.createDataFrame(
        [], "source string, n_docs_kept bigint, n_tokens_kept bigint"
    ).write.parquet(os.path.join(snaps, "00000_init"))

    cut = docs.agg(F.expr("CAST(max(doc_id) / 2 AS BIGINT)")).first()[0]

    def arrive(df, name, mtime):
        tmp = str(tmp_path / f"slice_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.startswith("part-"))
        dst = os.path.join(arrivals, f"{name}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    arrive(docs.where(F.col("doc_id") <= cut), "arr_000", 1_000_000)
    W.run_boilerplate_gate_fold(spark, arrivals, snaps, ckpt,
                                boiler, _BP_N, 50)
    assert sorted(os.listdir(snaps))[-1] != "00000_init"

    arrive(docs.where(F.col("doc_id") > cut), "arr_001", 1_000_001)
    W.run_boilerplate_gate_fold(spark, arrivals, snaps, ckpt,
                                boiler, _BP_N, 50)  # resumes

    snap = spark.read.parquet(
        os.path.join(snaps, sorted(os.listdir(snaps))[-1]))
    got = sorted(tuple(r) for r in snap.collect())

    # single-shot batch gate over the whole corpus
    g = (docs.withColumn("t", F.expr(_TOKS_SPARK))
         .withColumn("nt", F.size("t").cast("bigint"))
         .withColumn("gs", F.expr(gs))
         .select("doc_id", "source", "nt",
                 F.size("gs").alias("n_sh"),
                 F.explode_outer("gs").alias("g")))
    hits = (g.join(boiler, "g").groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("nb")))
    per = (g.select("doc_id", "source", "nt", "n_sh").distinct()
           .join(hits, "doc_id", "left")
           .withColumn("nb", F.coalesce("nb", F.lit(0))))
    want = sorted(tuple(r) for r in
                  per.where(F.col("nb") * 100 <= F.col("n_sh") * 50)
                  .groupBy("source")
                  .agg(F.count(F.lit(1)).cast("bigint")
                       .alias("n_docs_kept"),
                       F.sum("nt").cast("bigint").alias("n_tokens_kept"))
                  .collect())
    assert got == want, "restarted gate fold must equal the batch gate"


def test_user_count_fold_survives_restart(spark, sf_dir, tmp_path):
    """Additive count-monoid restart contract for the Gini twin: the
    first half of EVENTS arrives (a user's events span the halves),
    the stream drains and STOPS; the rest arrives and a fresh start
    resumes from the same checkpoint. The folded per-user counts must
    equal the single-shot batch counts — summed across the seam, no
    user lost or double-counted."""
    import os

    import pyspark.sql.functions as F

    from iq_to_hdl_migration_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    arrivals = str(tmp_path / "arrivals")
    snaps = str(tmp_path / "snaps")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(arrivals)
    os.makedirs(snaps)
    spark.createDataFrame(
        [], "user_id bigint, n_events bigint"
    ).write.parquet(os.path.join(snaps, "00000_init"))

    cut = ev.agg(F.expr("CAST(max(event_id) / 2 AS BIGINT)")).first()[0]

    def arrive(df, name, mtime):
        tmp = str(tmp_path / f"slice_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.startswith("part-"))
        dst = os.path.join(arrivals, f"{name}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    arrive(ev.where(F.col("event_id") <= cut), "arr_000", 1_000_000)
    W.run_user_count_fold(spark, arrivals, snaps, ckpt)
    assert sorted(os.listdir(snaps))[-1] != "00000_init"

    arrive(ev.where(F.col("event_id") > cut), "arr_001", 1_000_001)
    W.run_user_count_fold(spark, arrivals, snaps, ckpt)  # resumes

    snap = spark.read.parquet(
        os.path.join(snaps, sorted(os.listdir(snaps))[-1]))
    got = sorted(tuple(r) for r in snap.collect())
    want = sorted(tuple(r) for r in
                  ev.groupBy("user_id")
                  .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
                  .collect())
    assert got == want, (
        "restarted fold's per-user counts must equal the batch counts")


def test_retention_fold_survives_restart(spark, sf_dir, tmp_path):
    """MIN/OR monoid restart contract for the retention twin: half the
    events arrive (signups and activity span the seam), the stream
    drains and STOPS; the rest arrives and a fresh start resumes from
    the same checkpoint. The folded state's cohort matrix must equal
    the single-shot batch computation — no user's cohort lost, no
    active week dropped or double-ORed."""
    import os

    import pyspark.sql.functions as F

    from iq_to_hdl_migration_spark.queries.events_queries import (
        events_retention_cohorts)
    from iq_to_hdl_migration_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type")
    arrivals = str(tmp_path / "arrivals")
    snaps = str(tmp_path / "snaps")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(arrivals)
    os.makedirs(snaps)
    spark.createDataFrame(
        [], W.RETENTION_STATE_SCHEMA
    ).write.parquet(os.path.join(snaps, "00000_init"))

    cut = ev.agg(F.expr("CAST(max(event_id) / 2 AS BIGINT)")).first()[0]

    def arrive(df, name, mtime):
        tmp = str(tmp_path / f"slice_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.startswith("part-"))
        dst = os.path.join(arrivals, f"{name}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    arrive(ev.where(F.col("event_id") <= cut), "arr_000", 1_000_000)
    W.run_retention_fold(spark, arrivals, snaps, ckpt)
    assert sorted(os.listdir(snaps))[-1] != "00000_init"

    arrive(ev.where(F.col("event_id") > cut), "arr_001", 1_000_001)
    W.run_retention_fold(spark, arrivals, snaps, ckpt)  # resumes

    snap = spark.read.parquet(
        os.path.join(snaps, sorted(os.listdir(snaps))[-1]))
    got = sorted(tuple(r) for r in
                 W.retention_from_state(snap).collect())
    want = sorted(tuple(r) for r in
                  events_retention_cohorts(spark, sf_dir).collect())
    assert got == want, (
        "restarted retention fold must equal the batch cohort matrix")


def test_retention_fold_rejects_out_of_range_weeks(spark):
    """The one-BIGINT mask bound is enforced, not assumed: an event
    past week 62 — or ANY pre-epoch event, including the -6..-1 day
    range whose week truncates to 0 (the r11 review hole) — must
    raise in the delta computation instead of silently entering the
    mask."""
    import pytest

    for ts in ("2026-01-01 00:00:00",   # week > 62
               "2023-12-31 23:00:00"):  # datediff -1: truncates to 0
        bad = spark.createDataFrame(
            [(1, 7, ts, "click")],
            "event_id bigint, user_id bigint, ts string, "
            "event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        with pytest.raises(Exception, match="retention fold supports"):
            W._retention_delta(bad).collect()


def test_bot_fold_survives_restart(spark, sf_dir, tmp_path):
    """Seam-carrying fold restart contract: the boundary gap between
    the two halves must be closed exactly once — the restarted fold's
    per-user state must reproduce the single-shot batch report,
    including gaps that span the arrival seam AND the restart."""
    import os

    import pyspark.sql.functions as FF

    from iq_to_hdl_migration_spark.queries.events_queries import (
        bot_report_from_counts, events_bot_score_report)
    from iq_to_hdl_migration_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts")
    arrivals = str(tmp_path / "arrivals")
    snaps = str(tmp_path / "snaps")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(arrivals)
    os.makedirs(snaps)
    spark.createDataFrame(
        [], W.BOT_STATE_SCHEMA).write.parquet(
        os.path.join(snaps, "00000_init"))

    cut = ev.agg(FF.expr("CAST(max(event_id) / 2 AS BIGINT)")).first()[0]

    def arrive(df, name, mtime):
        tmp = str(tmp_path / f"slice_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.startswith("part-"))
        dst = os.path.join(arrivals, f"{name}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    arrive(ev.where(FF.col("event_id") <= cut), "arr_000", 1_000_000)
    W.run_bot_count_fold(spark, arrivals, snaps, ckpt)
    arrive(ev.where(FF.col("event_id") > cut), "arr_001", 1_000_001)
    W.run_bot_count_fold(spark, arrivals, snaps, ckpt)  # resumes

    snap = spark.read.parquet(
        os.path.join(snaps, sorted(os.listdir(snaps))[-1]))
    got = sorted(tuple(r) for r in
                 bot_report_from_counts(snap.drop("last_us")).collect())
    want = sorted(tuple(r) for r in
                  events_bot_score_report(spark, sf_dir).collect())
    assert got == want


def test_bot_fold_refuses_out_of_order_batch(spark, tmp_path):
    """The ordered-fold contract is enforced in-plan BY THE REAL FOLD:
    a batch whose events predate a user's carried last_us must raise
    (driving run_bot_count_fold itself proves the guard survives
    column pruning)."""
    import os

    import pytest

    arrivals = str(tmp_path / "arrivals")
    snaps = str(tmp_path / "snaps")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(arrivals)
    os.makedirs(snaps)
    state = spark.createDataFrame(
        [(7, 3, 2, 0, 0, 1_800_000_000_000_000)],  # ~2027 in micros
        W.BOT_STATE_SCHEMA)
    state.write.parquet(os.path.join(snaps, "00000_init"))
    late = spark.createDataFrame(
        [(99, 7, "2024-01-01 00:00:01", )],
        "event_id bigint, user_id bigint, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    tmp = str(tmp_path / "slice")
    late.coalesce(1).write.parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.startswith("part-"))
    os.rename(os.path.join(tmp, part),
              os.path.join(arrivals, "arr_000.parquet"))
    # the 2024 event predates the carried ~2027 last_us -> must raise
    with pytest.raises(Exception, match="not time-contiguous"):
        W.run_bot_count_fold(spark, arrivals, snaps, ckpt)


def test_gap_hist_fold_survives_restart(spark, sf_dir, tmp_path):
    """Second seam-carrying fold's restart contract: gaps that span
    the arrival seam AND the restart are closed exactly once — the
    resumed fold's histogram must reproduce the single-shot batch
    histogram bit-for-bit."""
    import os

    import pyspark.sql.functions as FF

    from iq_to_hdl_migration_spark.queries.events_queries import (
        events_gap_powerlaw_histogram)
    from iq_to_hdl_migration_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts")
    arrivals = str(tmp_path / "arrivals")
    snaps = str(tmp_path / "snaps")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(arrivals)
    os.makedirs(snaps)
    spark.createDataFrame(
        [], W.GAP_HIST_STATE_SCHEMA).write.parquet(
        os.path.join(snaps, "00000_init"))

    cut = ev.agg(FF.expr("CAST(max(event_id) / 2 AS BIGINT)")).first()[0]

    def arrive(df, name, mtime):
        tmp = str(tmp_path / f"slice_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.startswith("part-"))
        dst = os.path.join(arrivals, f"{name}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    arrive(ev.where(FF.col("event_id") <= cut), "arr_000", 1_000_000)
    W.run_gap_hist_fold(spark, arrivals, snaps, ckpt)
    arrive(ev.where(FF.col("event_id") > cut), "arr_001", 1_000_001)
    W.run_gap_hist_fold(spark, arrivals, snaps, ckpt)  # resumes

    snap = spark.read.parquet(
        os.path.join(snaps, sorted(os.listdir(snaps))[-1]))
    got = sorted(tuple(r) for r in
                 (snap.where(FF.col("gap_bucket").isNotNull())
                  .groupBy("event_type",
                           FF.col("gap_bucket").alias("gap_bucket_log2s"))
                  .agg(FF.sum("n_gaps").cast("bigint").alias("n_gaps"))
                  ).collect())
    want = sorted(tuple(r) for r in
                  events_gap_powerlaw_histogram(spark, sf_dir).collect())
    assert got == want


def test_gap_hist_fold_refuses_out_of_order_batch(spark, tmp_path):
    """The seam guard must fire in the REAL fold (not a re-built
    expression) — proving it survives column pruning."""
    import os

    import pytest

    arrivals = str(tmp_path / "arrivals")
    snaps = str(tmp_path / "snaps")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(arrivals)
    os.makedirs(snaps)
    state = spark.createDataFrame(
        [(7, "click", None, None, 1_800_000_000_000_000)],
        W.GAP_HIST_STATE_SCHEMA)
    state.write.parquet(os.path.join(snaps, "00000_init"))
    late = spark.createDataFrame(
        [(99, 7, "click", "2024-01-01 00:00:01")],
        "event_id bigint, user_id bigint, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    tmp = str(tmp_path / "slice")
    late.coalesce(1).write.parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.startswith("part-"))
    os.rename(os.path.join(tmp, part),
              os.path.join(arrivals, "arr_000.parquet"))
    with pytest.raises(Exception, match="not time-contiguous"):
        W.run_gap_hist_fold(spark, arrivals, snaps, ckpt)


def test_funnel_fold_survives_restart(spark, sf_dir, tmp_path):
    """Ordered-funnel fold restart contract: stage chains that span
    the arrival seam AND the restart must resolve exactly once — the
    resumed fold reproduces the single-shot batch funnel."""
    import os

    import pyspark.sql.functions as FF

    from iq_to_hdl_migration_spark.queries.events_queries import (
        events_funnel_counts)
    from iq_to_hdl_migration_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts")
    arrivals = str(tmp_path / "arrivals")
    snaps = str(tmp_path / "snaps")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(arrivals)
    os.makedirs(snaps)
    spark.createDataFrame(
        [], W.FUNNEL_STATE_SCHEMA).write.parquet(
        os.path.join(snaps, "00000_init"))

    cut = ev.agg(FF.expr("CAST(max(event_id) / 2 AS BIGINT)")).first()[0]

    def arrive(df, name, mtime):
        tmp = str(tmp_path / f"slice_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.startswith("part-"))
        dst = os.path.join(arrivals, f"{name}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    arrive(ev.where(FF.col("event_id") <= cut), "arr_000", 1_000_000)
    W.run_funnel_fold(spark, arrivals, snaps, ckpt)
    arrive(ev.where(FF.col("event_id") > cut), "arr_001", 1_000_001)
    W.run_funnel_fold(spark, arrivals, snaps, ckpt)  # resumes

    snap = spark.read.parquet(
        os.path.join(snaps, sorted(os.listdir(snaps))[-1]))
    got = sorted(tuple(r) for r in
                 W.funnel_counts_from_state(snap).collect())
    want = sorted(tuple(r) for r in
                  events_funnel_counts(spark, sf_dir).collect())
    assert got == want


def test_funnel_fold_refuses_out_of_order_batch(spark, tmp_path):
    """The guard must survive column pruning: a batch predating a
    user's carried last_us raises through the consumed d_last_us."""
    import os

    import pytest

    arrivals = str(tmp_path / "arrivals")
    snaps = str(tmp_path / "snaps")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(arrivals)
    os.makedirs(snaps)
    state = spark.createDataFrame(
        [(7, 1_800_000_000_000_000, None, None, 1_800_000_000_000_000)],
        W.FUNNEL_STATE_SCHEMA)
    state.write.parquet(os.path.join(snaps, "00000_init"))
    late = spark.createDataFrame(
        [(99, 7, "view", "2024-01-01 00:00:01")],
        "event_id bigint, user_id bigint, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    tmp = str(tmp_path / "slice")
    late.coalesce(1).write.parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.startswith("part-"))
    os.rename(os.path.join(tmp, part),
              os.path.join(arrivals, "arr_000.parquet"))
    with pytest.raises(Exception, match="not time-contiguous"):
        W.run_funnel_fold(spark, arrivals, snaps, ckpt)
