"""Structured Streaming operators over the events stream.

The reference is batch-only with file checkpoints (SURVEY §2.10) — this
module is the brief's forward-looking streaming surface: the same
hourly/sessionization semantics as queries/events_queries.py, expressed
as continuous queries so a migration's change-feed (or any event
stream) can be processed incrementally.

  * hourly counts: watermarked tumbling window — late events beyond
    the watermark are dropped, state is bounded.
  * sessionization: applyInPandasWithState keyed by user_id — the
    stateful 30-minute-gap session counter; state carries (last seen
    timestamp, open session count) across micro-batches.

Tests run with trigger(availableNow=True) against the static events
parquet and assert equality with the batch twins — the semantics
contract between the two implementations.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Canonical post-normalization schema (what every operator below sees).
EVENTS_SCHEMA = ("event_id bigint, ts timestamp, user_id bigint, "
                 "event_type string, value double, props string")

GAP_US = 1800 * 1_000_000

SESSION_OUT_SCHEMA = "user_id bigint, n_sessions bigint, n_events bigint"
SESSION_STATE_SCHEMA = "last_us bigint, n_sessions bigint, n_events bigint"


def _raw_events_schema(spark: SparkSession, path: str):
    """The file source needs a declared schema, and the on-disk flavor
    of events.ts varies by Spark version (TIMESTAMP(NANOS) -> long on
    <= 4.0 under nanosAsLong, TIMESTAMP_NTZ on >= 4.1) — so infer it
    from a batch read of the same files and normalize after."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    return spark.read.parquet(path).schema


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet, ts normalized to the
    same canonical micros TIMESTAMP as sources.tables.load_table."""
    from iq_to_hdl_migration_spark.sources.tables import (
        normalize_event_ts, table_path)

    schema = _raw_events_schema(spark, table_path(sf_dir, "events"))
    # the file source wants a directory; point at sf_dir and glob the
    # single events file
    raw = (spark.readStream.schema(schema)
           .option("pathGlobFilter", "events.parquet")
           .parquet(sf_dir.rstrip("/")))
    return normalize_event_ts(raw)


def hourly_counts_stream(events: DataFrame) -> DataFrame:
    """Watermarked tumbling 1h window x event_type counts."""
    return (events
            .withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("win.start").alias("hour_ts"), "event_type",
                    "n_events"))


def _session_fn(key: tuple, pdfs: Iterator, state: GroupState) -> Iterator:
    """Stateful session counter for one user (30-min gap)."""
    import pandas as pd

    if state.exists:
        last_us, n_sessions, n_events = state.get
    else:
        last_us, n_sessions, n_events = None, 0, 0
    for pdf in pdfs:
        for us in sorted(int(v) for v in pdf["us"]):
            if last_us is None or us - last_us > GAP_US:
                n_sessions += 1
            last_us = us
            n_events += 1
    state.update((last_us, n_sessions, n_events))
    yield pd.DataFrame([(key[0], n_sessions, n_events)],
                       columns=["user_id", "n_sessions", "n_events"])


def sessionize_stream(events: DataFrame) -> DataFrame:
    """applyInPandasWithState sessionization keyed by user (emits the
    running per-user totals each micro-batch)."""
    keyed = (events.select("user_id", F.unix_micros("ts").alias("us"))
             .groupBy("user_id"))
    return keyed.applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(events: DataFrame) -> DataFrame:
    """Streaming exact dedup on event_id: dropDuplicatesWithinWatermark
    keys state by id and expires it past the watermark — bounded state,
    the streaming twin of `dropDuplicates` in the batch dedup operator
    (operators/dedup.py exact path)."""
    return (events.withWatermark("ts", "2 hours")
            .dropDuplicatesWithinWatermark(["event_id"]))


def run_to_memory(sdf: DataFrame, table_name: str,
                  output_mode: str = "complete") -> None:
    """Drain the stream with availableNow into an in-memory sink and
    block until done (test/driver harness helper)."""
    q = (sdf.writeStream.format("memory").queryName(table_name)
         .outputMode(output_mode)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def streaming_hourly_counts(spark: SparkSession, sf_dir: str,
                            _query_name: str = "stream_hourly") -> DataFrame:
    """End-to-end: stream -> watermarked window agg -> memory sink ->
    result DataFrame (batch-collectable, so driver-checkable)."""
    events = read_events_stream(spark, sf_dir)
    run_to_memory(hourly_counts_stream(events), _query_name, "complete")
    return spark.table(_query_name)


def streaming_dedup_count(spark: SparkSession, sf_dir: str,
                          _query_name: str = "stream_dedup") -> DataFrame:
    """End-to-end: stream -> watermarked exact dedup -> memory sink;
    returns the deduplicated rows (append mode)."""
    events = read_events_stream(spark, sf_dir)
    run_to_memory(dedup_stream(events), _query_name, "append")
    return spark.table(_query_name)


def purchase_click_join_stream(events: DataFrame) -> DataFrame:
    """Stream-stream inner join with a time-range condition: each
    purchase joined to the same user's clicks in the preceding hour.
    Both sides carry watermarks so the join state is bounded — Spark
    evicts click state once the purchase-side watermark passes
    click_ts + 1h.  The batch twin (same predicate as a batch join) is
    the semantics contract in tests."""
    clicks = (events.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts"))
              .withWatermark("click_ts", "2 hours"))
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select("user_id", "event_id", "ts")
                 .withWatermark("ts", "2 hours"))
    return purchases.join(
        clicks,
        F.expr("user_id = c_user AND "
               "ts BETWEEN click_ts AND click_ts + INTERVAL 1 HOUR"),
    ).select("user_id", "event_id", "click_id", "ts", "click_ts")


def streaming_purchase_click_join(spark: SparkSession, sf_dir: str,
                                  _query_name: str = "stream_ssjoin"
                                  ) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    run_to_memory(purchase_click_join_stream(events), _query_name, "append")
    return spark.table(_query_name)


def incremental_dedup_to_parquet(spark: SparkSession, src_dir: str,
                                 sink_dir: str, ckpt_dir: str,
                                 schema: str | None = None) -> None:
    """Checkpointed incremental pipeline: file-source stream ->
    watermarked exact dedup -> exactly-once parquet sink.

    This is the streaming form of the reference's resume ledger (S14 /
    V5, migration.py:1940-2049): progress lives in the checkpoint, so a
    stopped pipeline re-run with the same `ckpt_dir` resumes from the
    last committed micro-batch — already-processed input files are
    never re-emitted, and duplicate/late re-sends of old rows are
    dropped by the dedup state restored from the checkpoint.  Each call
    drains whatever input is currently available (availableNow) and
    returns; call again after more files arrive.  Use
    `.option("maxFilesPerTrigger", n)` on the reader for rate-limited
    backfills at scale.
    """
    from iq_to_hdl_migration_spark.sources.tables import normalize_event_ts

    schema = schema or _raw_events_schema(spark, src_dir)
    raw = spark.readStream.schema(schema).parquet(src_dir)
    events = normalize_event_ts(raw)
    q = (dedup_stream(events)
         .writeStream.format("parquet")
         .option("path", sink_dir)
         .option("checkpointLocation", ckpt_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def streaming_sessionization(spark: SparkSession, sf_dir: str,
                             _query_name: str = "stream_sessions"
                             ) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    run_to_memory(sessionize_stream(events), _query_name, "update")
    # update-mode sink may hold several emissions per key; keep the last
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (spark.table(_query_name)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))


def enrichment_stream(events: DataFrame, user_dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: each micro-batch broadcast-joins
    the (small, slowly-changing) user dimension — the standard pattern
    for attaching segments/features to a live event feed. The static
    side is re-read per micro-batch, so dimension updates between
    batches are picked up without restarting the query."""
    enriched = events.join(F.broadcast(user_dim), "user_id", "left")
    return (enriched
            .groupBy(F.coalesce(F.col("segment"), F.lit("unknown"))
                     .alias("segment"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,6)"))
                     .alias("total_value")))


def streaming_enriched_counts(spark: SparkSession, sf_dir: str,
                              _query_name: str = "stream_enrich"
                              ) -> DataFrame:
    """End-to-end: event stream x static per-user segment dim (the
    user's first-ever event type — derived from the same parquet, so
    the batch oracle can reproduce it) -> per-segment rollup."""
    from iq_to_hdl_migration_spark.sources.tables import load_table
    ev_static = load_table(spark, sf_dir, "events")
    user_dim = (ev_static.groupBy("user_id")
                .agg(F.min_by("event_type", "ts").alias("segment")))
    events = read_events_stream(spark, sf_dir)
    run_to_memory(enrichment_stream(events, user_dim), _query_name,
                  "complete")
    return spark.table(_query_name)


def session_windows_stream(events: DataFrame) -> DataFrame:
    """NATIVE session_window aggregation on the stream (the merging
    state-window operator, watermark-bounded): per (user, session)
    event counts with session bounds. The streaming counterpart of
    queries/events_queries.py::events_session_windows_native — same
    operator, so the batch oracle is the semantics contract."""
    return (events
            .withWatermark("ts", "2 hours")
            .groupBy(F.session_window("ts", "30 minutes").alias("w"),
                     "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id",
                    F.unix_micros("w.start").alias("session_start_us"),
                    F.unix_micros("w.end").alias("session_end_us"),
                    F.col("n_events").cast("bigint").alias("n_events")))


def streaming_session_windows(spark: SparkSession, sf_dir: str,
                              _query_name: str = "stream_sessw") -> DataFrame:
    """End-to-end: stream -> watermarked native session_window ->
    memory sink. Complete mode so the availableNow drain emits every
    session including those still open at end-of-input (append mode
    would hold back sessions whose end exceeds the final watermark)."""
    events = read_events_stream(spark, sf_dir)
    run_to_memory(session_windows_stream(events), _query_name, "complete")
    return spark.table(_query_name)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet — the change-feed
    shape of a corpus that grows in batches."""
    from iq_to_hdl_migration_spark.sources.tables import table_path

    schema = spark.read.parquet(table_path(sf_dir, "documents")).schema
    return (spark.readStream.schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir.rstrip("/")))


def streaming_curation_counts(spark: SparkSession, sf_dir: str,
                              thresholds: DataFrame,
                              _query_name: str = "stream_curation"
                              ) -> DataFrame:
    """End-to-end streaming curation: stream of documents -> stream-
    static broadcast join against the (source, thr16) mixture
    thresholds -> deterministic md5-bucket keep filter -> running
    per-source kept counts (complete mode). The keep decision is
    content-addressed, so the streaming pass admits EXACTLY the same
    documents as the batch mix_apply_downsample — that equality is the
    registered oracle check, not just a test."""
    docs = read_documents_stream(spark, sf_dir)
    bucket16 = F.expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10)"
        " AS BIGINT)")
    kept = (docs.join(F.broadcast(thresholds), "source")
            .where(bucket16 < F.col("thr16"))
            .select("source",
                    F.size(F.expr(r"split(lower(trim(text)), '\\s+')"))
                    .cast("bigint").alias("nt")))
    agg = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("nt").alias("n_tokens_kept"))
    run_to_memory(agg, _query_name, "complete")
    return spark.table(_query_name)


# live work dir per (applicationId, query, source dir) for the
# incremental-dedup stream — re-invocations replace (and remove) the
# previous invocation's dir instead of accumulating one per call
_STREAM_WORK_DIRS: dict = {}


def _id_span(df: DataFrame, id_col: str) -> tuple[int | None, int | None]:
    """Inclusive [lo, hi] id domain for arrival slicing, fail-loud on
    NULL ids: an id-contiguous micro-batch plan cannot route a NULL-id
    row anywhere, and silently dropping it would break the advertised
    bit-for-bit equality with the shared batch oracle (which keeps
    every row). Slicing from the actual min also admits negative-id
    domains, which a hardcoded lo=0 would silently exclude.
    Returns (None, None) on an empty frame."""
    row = df.agg(F.min(id_col).alias("lo"), F.max(id_col).alias("hi"),
                 F.count(F.lit(1)).alias("n"),
                 F.count(id_col).alias("n_ids")).first()
    if row["n"] != row["n_ids"]:
        raise ValueError(
            f"{id_col}: {row['n'] - row['n_ids']} NULL ids — cannot "
            "slice into id-contiguous arrival batches without dropping "
            "rows the batch oracle keeps")
    return row["lo"], row["hi"]


def _stage_id_sliced_arrivals(df, id_col: str, lo: int, hi: int,
                              n_batches: int, work: str,
                              arrivals_dir: str) -> None:
    """Write `df` as `n_batches` id-contiguous single-file parquet
    arrivals with strictly increasing mtimes, so the file source
    drains them in arrival order. ONE implementation shared by every
    snapshot-fold twin — the r10 review found the same slicing loop
    pasted five times (and the r9 negative-id fix applied four times);
    any future slicing change lands here once."""
    import os
    import shutil

    span = max(1, (hi - lo + n_batches) // n_batches)
    for i in range(n_batches):
        lo_i = lo + i * span
        hi_i = min(hi, lo_i + span - 1)
        slice_df = df.where(F.col(id_col).between(lo_i, hi_i))
        tmp_i = os.path.join(work, f"slice_{i}")
        slice_df.coalesce(1).write.parquet(tmp_i)
        part = next(f for f in os.listdir(tmp_i)
                    if f.startswith("part-"))
        dst = os.path.join(arrivals_dir, f"arr_{i:03d}.parquet")
        shutil.move(os.path.join(tmp_i, part), dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
        shutil.rmtree(tmp_i)


def streaming_incremental_dedup(spark: SparkSession, sf_dir: str,
                                _query_name: str = "stream_inc_dedup",
                                n_batches: int = 3) -> DataFrame:
    """Continuously-deduped corpus: a documents ARRIVAL stream deduped
    per micro-batch against a persisted LSH index that each batch then
    extends — the streaming form of dedup_incremental_pairs, and the
    100 TB production shape (the index is the only state; per-batch
    work is O(batch + collisions), never a corpus re-signature).

    Harness: split documents at the same 60%-of-max-doc_id cut as the
    batch query; batch1 seeds the on-disk index; batch2 is written as
    `n_batches` id-contiguous parquet files drained one per micro-batch
    (maxFilesPerTrigger=1, availableNow). foreachBatch runs
    operators.dedup.lsh_batch_deltas: emit the batch's pairs, append
    the index deltas. Because pair emission is first-seen-wins on
    monotone ids and estimates come from the same stored minhash
    arrays, the unioned output is micro-batch-partition-INVARIANT and
    equals the single-shot batch result — that equality is the
    registered oracle check (and tests/test_streaming.py locks it
    against the batch operator directly)."""
    import os
    import shutil
    import tempfile

    from iq_to_hdl_migration_spark.operators.dedup import (
        build_lsh_index, lsh_batch_deltas)
    from iq_to_hdl_migration_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    # one aggregate serves both the NULL-id guard and the cut (the
    # fail-loud check would otherwise be a second full scan). The cut
    # must equal the batch twin's floor(max * 0.6D) BIT-for-bit, so it
    # is computed with the same IEEE double multiply, just driver-side.
    import math

    _lo, _hi = _id_span(docs, "doc_id")
    cut = None if _hi is None else int(math.floor(_hi * 0.6))
    if cut is None:
        # empty corpus: no arrivals to stream — return the empty pair
        # frame the batch twin would produce (same schema)
        return spark.createDataFrame(
            [], "id_a bigint, id_b bigint, est_jaccard double")
    batch1 = docs.where(F.col("doc_id") <= cut)
    batch2 = docs.where(F.col("doc_id") > cut)

    import atexit

    # the work dir must outlive this call (the returned DataFrame reads
    # the pairs parquet lazily) but not the process — and a long-lived
    # session that re-invokes this query (bench + correctness + retries)
    # must not accumulate one arrival-copy-of-40%-of-documents dir per
    # invocation. Keyed per (app, query, source): a re-invocation for
    # the same source removes the previous invocation's dir (its lazily
    # returned frame is superseded by the fresh one), so at most one
    # work dir per key exists at any time; atexit covers process exit.
    # NOT keyed on _query_name: the registry wrapper mints a fresh
    # stream name per invocation (q_stream_incdedup_<seq>), which would
    # make every call a distinct key and resurrect the leak
    wkey = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    prev = _STREAM_WORK_DIRS.pop(wkey, None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    work = tempfile.mkdtemp(prefix=f"{_query_name}_")
    _STREAM_WORK_DIRS[wkey] = work
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    bands_dir = os.path.join(work, "bands")
    digests_dir = os.path.join(work, "digests")
    arrivals_dir = os.path.join(work, "arrivals")
    pairs_dir = os.path.join(work, "pairs")
    ckpt_dir = os.path.join(work, "ckpt")
    os.makedirs(arrivals_dir)
    os.makedirs(pairs_dir)

    bands, digests = build_lsh_index(batch1)
    bands.write.parquet(os.path.join(bands_dir, "base"))
    digests.write.parquet(os.path.join(digests_dir, "base"))

    def _read_parts(path, exclude_batch=None):
        """Union of the base + per-batch subdirs under `path`,
        EXCLUDING the given batch's own subdir. A replay of a crashed
        batch (deltas written, checkpoint not committed) must compute
        against the PRE-batch index state: reading its own half-written
        deltas would make `remaining` empty, overwrite the good deltas
        with empty frames, and emit digest self-pairs."""
        subs = sorted(d for d in os.listdir(path)
                      if d != f"b{exclude_batch}")
        return spark.read.parquet(*[os.path.join(path, d) for d in subs])

    # id-contiguous arrival files via the shared staging helper; _hi
    # from the _id_span guard above replaces a redundant max() scan
    _stage_id_sliced_arrivals(batch2, "doc_id", cut + 1, _hi,
                              n_batches, work, arrivals_dir)

    schema = spark.read.parquet(arrivals_dir).schema

    def _process(batch_df, batch_id) -> None:
        # exclude_batch makes replay deterministic: the index read never
        # contains this batch's own (possibly half-written) deltas, so
        # recomputation yields byte-identical frames and the overwrites
        # below are true idempotent re-executions
        index_bands = _read_parts(bands_dir, exclude_batch=batch_id)
        index_digests = _read_parts(digests_dir, exclude_batch=batch_id)
        pairs, bands_delta, digests_delta = lsh_batch_deltas(
            batch_df, index_bands, index_digests)
        # belt-and-braces: a digest self-match (only possible if the
        # index somehow contains this batch) must never emit (X, X)
        pairs = (pairs.where(F.col("id_a") != F.col("id_b"))
                 .dropDuplicates(["id_a", "id_b"]))
        # every write is an OVERWRITE of a batch_id-scoped subdir, so a
        # checkpoint replay of a half-finished batch is idempotent —
        # no duplicate pairs, no double-appended index deltas
        pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_dir, f"b{batch_id}"))
        bands_delta.write.mode("overwrite").parquet(
            os.path.join(bands_dir, f"b{batch_id}"))
        digests_delta.write.mode("overwrite").parquet(
            os.path.join(digests_dir, f"b{batch_id}"))
        bands_delta.unpersist()

    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", 1)
         .parquet(arrivals_dir)
         .writeStream.foreachBatch(_process)
         .option("checkpointLocation", ckpt_dir)
         .trigger(availableNow=True)
         .queryName(_query_name)
         .start())
    q.awaitTermination()
    return _read_parts(pairs_dir)


def tws_available() -> bool:
    """transformWithStateInPandas needs the protobuf runtime for its
    state-server protocol; this container ships pyspark without it, so
    the operator below is environment-gated (the brief's import-try
    rule) — on a full install the equality test in
    tests/test_streaming.py runs instead of skipping."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def user_spend_stream_tws(events: DataFrame) -> DataFrame:
    """Per-user running purchase totals via transformWithStateInPandas
    (Spark 4.x's arbitrary-state API, successor to
    applyInPandasWithState — which stream_sessionization covers and
    the driver checks): ValueState holds (n, cents) per user; each
    micro-batch emits the updated running totals. Spend accumulates as
    integer cents (round(value * 100) per row), exactly like the
    fixed-point aggregates elsewhere, so the drained result is
    value-comparable to a batch SQL oracle. Requires protobuf (see
    tws_available); not a registry entry because this container cannot
    run it — the registered arbitrary-state coverage is the
    applyInPandasWithState twin."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class _Spend(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "tot", "n BIGINT, cents BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd
            n, cents = 0, 0
            if self._st.exists():
                prev = self._st.get()
                n, cents = int(prev[0]), int(prev[1])
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["value"].astype("float64")
                             .mul(100.0).round().astype("int64").sum())
            self._st.update((n, cents))
            yield pd.DataFrame({"user_id": [int(key[0])],
                                "n_purchases": [n],
                                "spend_cents": [cents]})

        def close(self) -> None:
            pass

    purchases = (events.where(F.col("event_type") == "purchase")
                 .select(F.col("user_id").cast("bigint").alias("user_id"),
                         F.col("value").cast("double").alias("value")))
    return purchases.groupBy("user_id").transformWithStateInPandas(
        _Spend(),
        outputStructType=("user_id bigint, n_purchases bigint, "
                          "spend_cents bigint"),
        outputMode="append",
        timeMode="none")


def streaming_user_spend_tws(spark: SparkSession, sf_dir: str,
                             _query_name: str = "stream_tws_spend"
                             ) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    run_to_memory(user_spend_stream_tws(events), _query_name, "append")
    # running totals are monotone non-decreasing (counts; values >= 0),
    # so the final per-user state is the max of the emitted rows
    return (spark.table(_query_name)
            .groupBy("user_id")
            .agg(F.max("n_purchases").alias("n_purchases"),
                 F.max("spend_cents").alias("spend_cents")))


# ---------------------------------------------------------------------------
# Streaming SCD2: the change-data-capture shape of the batch
# gaps-and-islands history builder (queries/temporal_queries.py::
# scd2_user_type_history).  State per user is ONE open run (last type,
# version counter, run start, run length) — constant size per key, the
# honest streaming formulation (carrying the full history in state
# would grow without bound).  A type change CLOSES the open run and
# appends it as a finished [valid_from, valid_to) history row; the
# still-open run lives only in state, exactly like the "current" row
# of a warehouse dimension that hasn't versioned yet.  The batch twin
# restricted to closed rows (valid_to IS NOT NULL) is the oracle.

SCD2_OUT_SCHEMA = ("user_id bigint, version bigint, event_type string, "
                   "valid_from_us bigint, valid_to_us bigint, "
                   "n_events bigint")
SCD2_STATE_SCHEMA = ("cur_type string, version bigint, run_start_us bigint, "
                     "run_n bigint")


def _scd2_fn(key: tuple, pdfs: "Iterator", state: GroupState) -> "Iterator":
    import pandas as pd

    if state.exists:
        cur_type, version, run_start_us, run_n = state.get
    else:
        cur_type, version, run_start_us, run_n = None, 0, None, 0
    out: list[tuple] = []
    rows: list[tuple] = []
    for pdf in pdfs:
        rows.extend(zip((int(v) for v in pdf["us"]),
                        (int(v) for v in pdf["event_id"]),
                        pdf["event_type"]))
    # ts order (event_id tiebreak) within the drained batch — matches
    # the batch twin's window ordering
    for us, _eid, etype in sorted(rows):
        if cur_type is None:
            cur_type, version, run_start_us, run_n = etype, 1, us, 1
        elif etype == cur_type:
            run_n += 1
        else:
            out.append((key[0], version, cur_type, run_start_us, us,
                        run_n))
            cur_type, version, run_start_us, run_n = (etype, version + 1,
                                                      us, 1)
    state.update((cur_type, version, run_start_us, run_n))
    cols = ["user_id", "version", "event_type", "valid_from_us",
            "valid_to_us", "n_events"]
    yield pd.DataFrame(out, columns=cols)


def scd2_stream(events: DataFrame) -> DataFrame:
    """applyInPandasWithState SCD2 run-tracker keyed by user: appends a
    history row each time an event-type run closes."""
    keyed = (events.select("user_id", "event_id", "event_type",
                           F.unix_micros("ts").alias("us"))
             .groupBy("user_id"))
    return keyed.applyInPandasWithState(
        _scd2_fn,
        outputStructType=SCD2_OUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_scd2(spark: SparkSession, sf_dir: str,
                   _query_name: str = "stream_scd2") -> DataFrame:
    """End-to-end: event stream -> stateful SCD2 run closing ->
    append-mode memory sink of finished history rows."""
    events = read_events_stream(spark, sf_dir)
    run_to_memory(scd2_stream(events), _query_name, "append")
    return spark.table(_query_name)


def streaming_dsir_gate(spark: SparkSession, sf_dir: str,
                        tgt_counts: list, src_counts: list,
                        n_buckets: int, keep_ppm: int,
                        _query_name: str = "stream_dsir") -> DataFrame:
    """Streaming DSIR quality gate: documents arrival stream ->
    per-document target-affinity score against PRECOMPUTED hashed-
    unigram bucket tables (the index an offline job ships to the
    ingest path) -> integer keep decision -> running per-source kept
    counts (complete mode over the bounded source key set).

    The bucket tables arrive as plain lists (<= n_buckets entries —
    constant at any corpus size) and are baked into the expression as
    literal arrays, so the whole score is stateless per document: no
    stream-side aggregation, no shuffle before the final bounded
    groupBy. The keep rule is the INTEGER cross-multiplication
    numer * 1e6 >= denom * keep_ppm — admit documents whose add-1-
    smoothed target/source affinity exceeds the corpus-average ratio
    keep_ppm = floor(1e6 * target_tokens / source_tokens) — carried
    in DECIMAL(38,0) so the products can never wrap however large the
    corpus counts grow; streaming and batch admit exactly the same
    documents, and that equality is the registered oracle check."""
    docs = read_documents_stream(spark, sf_dir)
    tgt_sql = "array(" + ",".join(f"{int(x)}L" for x in tgt_counts) + ")"
    src_sql = "array(" + ",".join(f"{int(x)}L" for x in src_counts) + ")"
    bks = (r"transform(split(lower(trim(text)), '\\s+'), "
           r"t -> CAST(conv(substr(md5(CAST(t AS BINARY)), 1, 15), "
           f"16, 10) AS BIGINT) % {n_buckets})")
    numer = (f"aggregate({bks}, 0L, (acc, b) -> "
             f"acc + element_at({tgt_sql}, CAST(b + 1 AS INT)) + 1L)")
    denom = (f"aggregate({bks}, 0L, (acc, b) -> "
             f"acc + element_at({src_sql}, CAST(b + 1 AS INT)) + 1L)")
    kept = (docs.withColumn("numer", F.expr(numer))
            .withColumn("denom", F.expr(denom))
            .where(F.expr(f"CAST(numer AS DECIMAL(38,0)) * 1000000 >= "
                          f"CAST(denom AS DECIMAL(38,0)) * {keep_ppm}"))
            .select("source",
                    F.size(F.expr(r"split(lower(trim(text)), '\\s+')"))
                    .cast("bigint").alias("nt")))
    agg = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("nt").cast("bigint").alias("n_tokens_kept"))
    run_to_memory(agg, _query_name, "complete")
    return spark.table(_query_name)


def streaming_bottomk_sample(spark: SparkSession, sf_dir: str, k: int,
                             _query_name: str = "stream_bottomk",
                             n_batches: int = 4) -> DataFrame:
    """Streaming twin of the consistent bottom-k-by-hash sampler: the
    documents corpus arrives as id-contiguous micro-batches; each
    batch folds into an on-disk per-lang bottom-k snapshot (merge =
    bottom-k of previous-snapshot ∪ batch's bottom-k — the
    mergeability property the batch query advertises and
    tests/test_properties.py locks for KMV, exercised here end-to-end
    with real micro-batch state).  Replay-safe: batch i always
    recomputes from snapshot i-1 (never its own half-written output),
    so re-execution is a byte-identical rewrite; state per lang is k
    rows forever, independent of stream length.  The final snapshot
    equals the single-shot batch sample — that equality is the
    registered oracle check.

    Supersede-on-reinvoke contract: a second call for the same
    (application, sf_dir) deletes the previous call's work dir —
    including the snapshot files backing the previously returned
    lazily-read DataFrame. Callers must not hold two live frames from
    successive invocations; materialize (collect/write) before
    re-invoking if the old result is still needed."""
    import atexit
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window

    from iq_to_hdl_migration_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.col("doc_id").cast("bigint").alias("doc_id"),
        F.expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), "
               "16, 10) AS BIGINT)").alias("hv"))

    wkey = (spark.sparkContext.applicationId,
            os.path.abspath(sf_dir), "bottomk")
    prev = _STREAM_WORK_DIRS.pop(wkey, None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    work = tempfile.mkdtemp(prefix=f"{_query_name}_")
    _STREAM_WORK_DIRS[wkey] = work
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    arrivals_dir = os.path.join(work, "arrivals")
    snap_dir = os.path.join(work, "snaps")
    ckpt_dir = os.path.join(work, "ckpt")
    os.makedirs(arrivals_dir)
    os.makedirs(snap_dir)

    # empty initial snapshot (sorts before every numbered one)
    docs.limit(0).write.parquet(os.path.join(snap_dir, "00000_init"))

    # id-contiguous arrival files with increasing mtimes so the file
    # source drains them in arrival order
    lo, hi = _id_span(docs, "doc_id")
    if hi is None:
        # empty corpus: nothing to stream — the empty init snapshot
        # IS the final state (matches the batch sampler on 0 rows)
        return spark.read.parquet(os.path.join(snap_dir, "00000_init"))
    _stage_id_sliced_arrivals(docs, "doc_id", lo, hi, n_batches,
                              work, arrivals_dir)

    run_bottomk_fold(spark, arrivals_dir, snap_dir, ckpt_dir, k)
    final = sorted(os.listdir(snap_dir))[-1]
    return spark.read.parquet(os.path.join(snap_dir, final))


def run_bottomk_fold(spark: SparkSession, arrivals_dir: str,
                     snap_dir: str, ckpt_dir: str, k: int) -> None:
    """Drain the arrivals dir (one file per micro-batch, availableNow)
    folding each batch into the per-lang bottom-k snapshot chain under
    snap_dir. Resumable: a later call with the same checkpoint dir
    picks up where the stream left off (the restart test locks this),
    and a replayed batch recomputes from the PRIOR snapshot, so
    re-execution rewrites its own snapshot byte-identically."""
    import os

    from pyspark.sql import Window

    schema = spark.read.parquet(arrivals_dir).schema
    w = Window.partitionBy("lang").orderBy("hv", "doc_id")

    def _bottomk(df: DataFrame) -> DataFrame:
        return (df.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= k).drop("_rn"))

    def _latest_before(batch_id: int) -> str:
        subs = sorted(d for d in os.listdir(snap_dir)
                      if d < f"{batch_id + 1:05d}_b")
        return os.path.join(snap_dir, subs[-1])

    def _process(batch_df, batch_id) -> None:
        prev_snap = spark.read.parquet(_latest_before(batch_id))
        merged = _bottomk(prev_snap.unionByName(
            _bottomk(batch_df.select("lang", "doc_id", "hv"))))
        (merged.write.mode("overwrite")
         .parquet(os.path.join(snap_dir, f"{batch_id + 1:05d}_b")))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(arrivals_dir))
    q = (stream.writeStream.foreachBatch(_process)
         .option("checkpointLocation", ckpt_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def streaming_market_basket(spark: SparkSession, sf_dir: str,
                            _query_name: str = "stream_basket",
                            n_batches: int = 4) -> DataFrame:
    """Streaming twin of orders_market_basket_lift: lineitem arrives as
    orderkey-contiguous micro-batches (a basket is an atomic order
    event, so every order lands whole in exactly one batch) and each
    batch folds ADDITIVELY into a unified support snapshot — rows
    (part_a, part_b, n) where part_b IS NULL marks an item-support row
    and both-NULL the order total. Merge = groupBy(keys).sum(n): pair/
    item/total supports are all additive across disjoint order sets,
    which is the mergeability the batch query's one-pass design
    advertises. Replay-safe like the bottom-k fold (batch i recomputes
    from snapshot i-1); the final report equals the single-shot batch
    result (shared oracle). State grows with distinct pairs — the
    production variant prunes below min-support with a lossy-counting
    bound; at this corpus the pair domain is orders x width^2.

    Supersede-on-reinvoke contract: same as streaming_bottomk_sample —
    a second call for the same (application, sf_dir) deletes the
    previous call's snapshot files."""
    import atexit
    import os
    import shutil
    import tempfile

    from iq_to_hdl_migration_spark.queries.cooccurrence_queries import (
        _BASKET_MIN_SUP, basket_lift_report, basket_pair_supports)
    from iq_to_hdl_migration_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")

    wkey = (spark.sparkContext.applicationId,
            os.path.abspath(sf_dir), "basket")
    prev = _STREAM_WORK_DIRS.pop(wkey, None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    work = tempfile.mkdtemp(prefix=f"{_query_name}_")
    _STREAM_WORK_DIRS[wkey] = work
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    arrivals_dir = os.path.join(work, "arrivals")
    snap_dir = os.path.join(work, "snaps")
    ckpt_dir = os.path.join(work, "ckpt")
    os.makedirs(arrivals_dir)
    os.makedirs(snap_dir)

    empty = spark.createDataFrame(
        [], "part_a bigint, part_b bigint, n bigint")
    empty.write.parquet(os.path.join(snap_dir, "00000_init"))

    lo, hi = _id_span(li, "l_orderkey")
    if hi is None:
        return spark.read.parquet(os.path.join(snap_dir, "00000_init"))
    _stage_id_sliced_arrivals(li, "l_orderkey", lo, hi, n_batches,
                              work, arrivals_dir)

    run_basket_fold(spark, arrivals_dir, snap_dir, ckpt_dir)

    final = sorted(os.listdir(snap_dir))[-1]
    snap = spark.read.parquet(os.path.join(snap_dir, final))
    pair_sup = (snap.where(F.col("part_b").isNotNull())
                .select("part_a", "part_b", F.col("n").alias("n_ab"))
                .where(F.col("n_ab") >= _BASKET_MIN_SUP))
    item_sup = (snap.where(F.col("part_b").isNull()
                           & F.col("part_a").isNotNull())
                .select(F.col("part_a").alias("l_partkey"), "n"))
    tot = (snap.where(F.col("part_a").isNull() & F.col("part_b").isNull())
           .select(F.col("n").alias("n_orders")))
    return basket_lift_report(pair_sup, item_sup, tot)


def run_basket_fold(spark: SparkSession, arrivals_dir: str,
                    snap_dir: str, ckpt_dir: str) -> None:
    """Drain the arrivals dir folding each batch's basket supports into
    the unified additive snapshot chain. Resumable under the same
    checkpoint dir; a replayed batch recomputes from the PRIOR
    snapshot, so re-execution rewrites its snapshot byte-identically."""
    import os

    from iq_to_hdl_migration_spark.queries.cooccurrence_queries import (
        basket_pair_supports)

    schema = spark.read.parquet(arrivals_dir).schema

    def _latest_before(batch_id: int) -> str:
        subs = sorted(d for d in os.listdir(snap_dir)
                      if d < f"{batch_id + 1:05d}_b")
        return os.path.join(snap_dir, subs[-1])

    def _delta(batch_df: DataFrame) -> DataFrame:
        baskets = (batch_df.groupBy("l_orderkey")
                   .agg(F.sort_array(F.collect_set("l_partkey"))
                        .alias("parts")))
        pairs = basket_pair_supports(baskets).select(
            "part_a", "part_b", F.col("n_ab").alias("n"))
        items = (baskets.select(F.explode("parts").alias("part_a"))
                 .groupBy("part_a")
                 .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
                 .select("part_a", F.lit(None).cast("bigint")
                         .alias("part_b"), "n"))
        tot = (baskets.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
               .select(F.lit(None).cast("bigint").alias("part_a"),
                       F.lit(None).cast("bigint").alias("part_b"), "n"))
        return pairs.unionByName(items).unionByName(tot)

    def _process(batch_df, batch_id) -> None:
        prev_snap = spark.read.parquet(_latest_before(batch_id))
        merged = (prev_snap.unionByName(_delta(batch_df))
                  .groupBy("part_a", "part_b")
                  .agg(F.sum("n").cast("bigint").alias("n")))
        (merged.write.mode("overwrite")
         .parquet(os.path.join(snap_dir, f"{batch_id + 1:05d}_b")))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(arrivals_dir))
    q = (stream.writeStream.foreachBatch(_process)
         .option("checkpointLocation", ckpt_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def streaming_ab_test(spark: SparkSession, sf_dir: str,
                      _query_name: str = "stream_ab",
                      n_batches: int = 4) -> DataFrame:
    """Streaming twin of events_ab_test_report: events arrive as
    event_id-contiguous micro-batches (a user's events deliberately
    SPAN batches) and each batch folds into a per-user conversion
    snapshot — rows (user_id, is_conv), merge = groupBy(user_id).
    max(is_conv), the idempotent OR-monoid a streaming distinct-user
    aggregate needs. Variant assignment is a stateless md5 hash of the
    user id (content-addressed — no assignment table in state), so
    snapshot state is exactly one row per distinct user, the minimum
    any exact per-user metric can hold. Replay-safe like the other
    folds (batch i recomputes from snapshot i-1); the final report
    equals the single-shot batch result bit-for-bit (shared oracle).

    Supersede-on-reinvoke contract: same as streaming_bottomk_sample —
    a second call for the same (application, sf_dir) deletes the
    previous call's snapshot files."""
    import atexit
    import os
    import shutil
    import tempfile

    from iq_to_hdl_migration_spark.queries.cooccurrence_queries import (
        ab_test_report_tail)
    from iq_to_hdl_migration_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type")

    wkey = (spark.sparkContext.applicationId,
            os.path.abspath(sf_dir), "ab_test")
    prev = _STREAM_WORK_DIRS.pop(wkey, None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    work = tempfile.mkdtemp(prefix=f"{_query_name}_")
    _STREAM_WORK_DIRS[wkey] = work
    arrivals_dir = os.path.join(work, "arrivals")
    snap_dir = os.path.join(work, "snaps")
    ckpt_dir = os.path.join(work, "ckpt")
    os.makedirs(arrivals_dir)
    os.makedirs(snap_dir)
    atexit.register(shutil.rmtree, work, ignore_errors=True)

    empty = spark.createDataFrame([], "user_id bigint, is_conv int")
    empty.write.parquet(os.path.join(snap_dir, "00000_init"))

    lo, hi = _id_span(ev, "event_id")
    if hi is None:
        snap = spark.read.parquet(os.path.join(snap_dir, "00000_init"))
        return ab_test_report_tail(_ab_assign(snap))
    _stage_id_sliced_arrivals(ev, "event_id", lo, hi, n_batches,
                              work, arrivals_dir)

    run_ab_test_fold(spark, arrivals_dir, snap_dir, ckpt_dir)

    final = sorted(os.listdir(snap_dir))[-1]
    snap = spark.read.parquet(os.path.join(snap_dir, final))
    return ab_test_report_tail(_ab_assign(snap))


def _ab_assign(snap: DataFrame) -> DataFrame:
    """(user_id, is_conv) snapshot -> (in_a, is_conv): the stateless
    md5 variant split, identical to the batch query's expression."""
    return snap.select(
        F.when(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
               < "8", 1).otherwise(0).alias("in_a"),
        F.col("is_conv"))


def run_ab_test_fold(spark: SparkSession, arrivals_dir: str,
                     snap_dir: str, ckpt_dir: str) -> None:
    """Drain the arrivals dir folding each batch's per-user conversion
    flags into the unified snapshot chain. Resumable under the same
    checkpoint dir; a replayed batch recomputes from the PRIOR
    snapshot, so re-execution rewrites its snapshot byte-identically."""
    import os

    schema = spark.read.parquet(arrivals_dir).schema

    def _latest_before(batch_id: int) -> str:
        subs = sorted(d for d in os.listdir(snap_dir)
                      if d < f"{batch_id + 1:05d}_b")
        return os.path.join(snap_dir, subs[-1])

    def _delta(batch_df: DataFrame) -> DataFrame:
        return (batch_df.groupBy("user_id")
                .agg(F.max(F.when(F.col("event_type") == "purchase", 1)
                           .otherwise(0)).cast("int").alias("is_conv")))

    def _process(batch_df, batch_id) -> None:
        prev_snap = spark.read.parquet(_latest_before(batch_id))
        merged = (prev_snap.unionByName(_delta(batch_df))
                  .groupBy("user_id")
                  .agg(F.max("is_conv").cast("int").alias("is_conv")))
        (merged.write.mode("overwrite")
         .parquet(os.path.join(snap_dir, f"{batch_id + 1:05d}_b")))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(arrivals_dir))
    q = (stream.writeStream.foreachBatch(_process)
         .option("checkpointLocation", ckpt_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def streaming_boilerplate_gate(spark: SparkSession, sf_dir: str,
                               boiler_set: DataFrame, n: int,
                               min_docs: int, max_ratio_pct: int,
                               _query_name: str = "stream_bp",
                               n_batches: int = 4) -> DataFrame:
    """Streaming boilerplate gate: documents arrive as doc_id-contiguous
    micro-batches (a document is atomic) and each batch admits docs
    whose boilerplate-shingle fraction is <= max_ratio_pct% against a
    FROZEN boilerplate set — the offline-built index (distinct n-gram
    shingles recurring in >= min_docs base docs) that an ingest path
    ships, exactly like the DSIR gate's bucket tables but vocabulary-
    sized, so it stays a DataFrame joined ON THE SHINGLE KEY rather
    than a baked-in literal. Per-source kept counts fold ADDITIVELY
    into a snapshot chain (disjoint doc sets — the basket-fold
    mergeability); the final report equals the single-shot batch
    result (shared oracle). Replay-safe: batch i recomputes from
    snapshot i-1.

    Supersede-on-reinvoke contract: same as streaming_bottomk_sample."""
    import atexit
    import os
    import shutil
    import tempfile

    from iq_to_hdl_migration_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text")

    wkey = (spark.sparkContext.applicationId,
            os.path.abspath(sf_dir), "bp_gate")
    prev = _STREAM_WORK_DIRS.pop(wkey, None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    work = tempfile.mkdtemp(prefix=f"{_query_name}_")
    _STREAM_WORK_DIRS[wkey] = work
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    arrivals_dir = os.path.join(work, "arrivals")
    snap_dir = os.path.join(work, "snaps")
    ckpt_dir = os.path.join(work, "ckpt")
    os.makedirs(arrivals_dir)
    os.makedirs(snap_dir)

    empty = spark.createDataFrame(
        [], "source string, n_docs_kept bigint, n_tokens_kept bigint")
    empty.write.parquet(os.path.join(snap_dir, "00000_init"))

    lo, hi = _id_span(docs, "doc_id")
    if hi is None:
        return spark.read.parquet(os.path.join(snap_dir, "00000_init"))
    _stage_id_sliced_arrivals(docs, "doc_id", lo, hi, n_batches,
                              work, arrivals_dir)

    run_boilerplate_gate_fold(spark, arrivals_dir, snap_dir, ckpt_dir,
                              boiler_set, n, max_ratio_pct)

    final = sorted(os.listdir(snap_dir))[-1]
    return spark.read.parquet(os.path.join(snap_dir, final))


def run_boilerplate_gate_fold(spark: SparkSession, arrivals_dir: str,
                              snap_dir: str, ckpt_dir: str,
                              boiler_set: DataFrame, n: int,
                              max_ratio_pct: int) -> None:
    """Drain the arrivals dir: per batch, score each document's
    boilerplate fraction against the frozen shingle set (stream-side
    shingles join the static index on the shingle key), admit docs at
    <= max_ratio_pct%, and fold per-source kept counts additively into
    the snapshot chain. Resumable under the same checkpoint dir."""
    import os

    schema = spark.read.parquet(arrivals_dir).schema
    toks = r"split(lower(trim(text)), '\\s+')"
    gs = (f"CASE WHEN size(t) >= {n} THEN "
          f"array_distinct(transform(sequence(1, size(t) - {n} + 1), "
          f"i -> concat_ws(' ', slice(t, i, {n})))) "
          f"ELSE array() END")

    def _latest_before(batch_id: int) -> str:
        subs = sorted(d for d in os.listdir(snap_dir)
                      if d < f"{batch_id + 1:05d}_b")
        return os.path.join(snap_dir, subs[-1])

    def _delta(batch_df: DataFrame) -> DataFrame:
        g = (batch_df
             .withColumn("t", F.expr(toks))
             .withColumn("nt", F.size("t").cast("bigint"))
             .withColumn("gs", F.expr(gs))
             .select("doc_id", "source", "nt",
                     F.size("gs").alias("n_sh"),
                     F.explode_outer("gs").alias("g")))
        hits = (g.join(boiler_set, "g")
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n_boiler")))
        per_doc = (g.select("doc_id", "source", "nt", "n_sh").distinct()
                   .join(hits, "doc_id", "left")
                   .withColumn("n_boiler",
                               F.coalesce("n_boiler", F.lit(0))))
        # integer cross-multiplication: admit iff
        # n_boiler / n_sh <= max_ratio_pct / 100 (empty-shingle docs
        # have zero boilerplate and are admitted)
        kept = per_doc.where(F.col("n_boiler") * 100
                             <= F.col("n_sh") * max_ratio_pct)
        return (kept.groupBy("source")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs_kept"),
                     F.sum("nt").cast("bigint").alias("n_tokens_kept")))

    def _process(batch_df, batch_id) -> None:
        prev_snap = spark.read.parquet(_latest_before(batch_id))
        merged = (prev_snap.unionByName(_delta(batch_df))
                  .groupBy("source")
                  .agg(F.sum("n_docs_kept").cast("bigint")
                       .alias("n_docs_kept"),
                       F.sum("n_tokens_kept").cast("bigint")
                       .alias("n_tokens_kept")))
        (merged.write.mode("overwrite")
         .parquet(os.path.join(snap_dir, f"{batch_id + 1:05d}_b")))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(arrivals_dir))
    q = (stream.writeStream.foreachBatch(_process)
         .option("checkpointLocation", ckpt_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def streaming_user_activity_gini(spark: SparkSession, sf_dir: str,
                                 _query_name: str = "stream_gini",
                                 n_batches: int = 4) -> DataFrame:
    """Streaming twin of events_poweruser_gini: events arrive as
    event_id-contiguous micro-batches (a user's events deliberately
    SPAN batches) and each batch folds per-user event counts into a
    snapshot — merge = groupBy(user_id).sum(n_events), the additive
    count monoid, so state is exactly one row per distinct user. The
    Gini itself is NOT computed incrementally (rank sums are not
    mergeable); the final snapshot feeds the SAME closed-form
    histogram tail as the batch query, so the report equals the
    single-shot batch result bit-for-bit (shared oracle). Replay-safe:
    batch i recomputes from snapshot i-1.

    Supersede-on-reinvoke contract: same as streaming_bottomk_sample."""
    import atexit
    import os
    import shutil
    import tempfile

    from iq_to_hdl_migration_spark.queries.events_queries import (
        gini_from_user_counts)
    from iq_to_hdl_migration_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")

    wkey = (spark.sparkContext.applicationId,
            os.path.abspath(sf_dir), "user_gini")
    prev = _STREAM_WORK_DIRS.pop(wkey, None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    work = tempfile.mkdtemp(prefix=f"{_query_name}_")
    _STREAM_WORK_DIRS[wkey] = work
    arrivals_dir = os.path.join(work, "arrivals")
    snap_dir = os.path.join(work, "snaps")
    ckpt_dir = os.path.join(work, "ckpt")
    os.makedirs(arrivals_dir)
    os.makedirs(snap_dir)
    atexit.register(shutil.rmtree, work, ignore_errors=True)

    empty = spark.createDataFrame([], "user_id bigint, n_events bigint")
    empty.write.parquet(os.path.join(snap_dir, "00000_init"))

    lo, hi = _id_span(ev, "event_id")
    if hi is None:
        snap = spark.read.parquet(os.path.join(snap_dir, "00000_init"))
        return gini_from_user_counts(snap)
    _stage_id_sliced_arrivals(ev, "event_id", lo, hi, n_batches,
                              work, arrivals_dir)

    run_user_count_fold(spark, arrivals_dir, snap_dir, ckpt_dir)

    final = sorted(os.listdir(snap_dir))[-1]
    snap = spark.read.parquet(os.path.join(snap_dir, final))
    return gini_from_user_counts(snap)


def run_user_count_fold(spark: SparkSession, arrivals_dir: str,
                        snap_dir: str, ckpt_dir: str) -> None:
    """Drain the arrivals dir folding each batch's per-user event
    counts into the snapshot chain (merge = sum per user). Resumable
    under the same checkpoint dir; a replayed batch recomputes from
    the PRIOR snapshot, so re-execution rewrites its snapshot
    byte-identically."""
    import os

    schema = spark.read.parquet(arrivals_dir).schema

    def _latest_before(batch_id: int) -> str:
        subs = sorted(d for d in os.listdir(snap_dir)
                      if d < f"{batch_id + 1:05d}_b")
        return os.path.join(snap_dir, subs[-1])

    def _delta(batch_df: DataFrame) -> DataFrame:
        return (batch_df.groupBy("user_id")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_events")))

    def _process(batch_df, batch_id) -> None:
        prev_snap = spark.read.parquet(_latest_before(batch_id))
        merged = (prev_snap.unionByName(_delta(batch_df))
                  .groupBy("user_id")
                  .agg(F.sum("n_events").cast("bigint").alias("n_events")))
        (merged.write.mode("overwrite")
         .parquet(os.path.join(snap_dir, f"{batch_id + 1:05d}_b")))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(arrivals_dir))
    q = (stream.writeStream.foreachBatch(_process)
         .option("checkpointLocation", ckpt_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()


# ---------------------------------------------------------------------------
# Retention-cohort twin: per-user state = (cohort week, active-week
# bitmask). Both halves are true monoids — MIN for the signup cohort
# week, bitwise OR for the activity mask — so batches merge in any
# arrival split and a replayed batch recomputes byte-identically from
# the prior snapshot. The mask bounds state at ONE BIGINT per user for
# corpora up to 63 weeks (~14 months); longer corpora raise loudly in
# the delta instead of silently wrapping (the documented-bound
# discipline of the Gini rank sums).
# ---------------------------------------------------------------------------

_RET_MAX_WEEK = 62
RETENTION_STATE_SCHEMA = "user_id bigint, cohort_week int, week_mask bigint"


def _retention_week_col():
    # guard the RAW day offset, not the truncated week: datediff in
    # -6..-1 truncates to week 0 and would silently pass a pre-epoch
    # event into the mask (r11 review)
    dd = F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
    week = (dd / 7).cast("int")
    return (F.when((dd < 0) | (week > _RET_MAX_WEEK),
                   F.raise_error(F.concat(
                       F.lit("retention fold supports weeks 0.."
                             f"{_RET_MAX_WEEK} (one BIGINT mask); "
                             "violated at event_id="),
                       F.col("event_id").cast("string"))))
            .otherwise(week))


def _retention_delta(batch_df: DataFrame) -> DataFrame:
    week = _retention_week_col()
    return (batch_df
            .select("user_id", week.alias("w"),
                    F.col("event_type"))
            .groupBy("user_id")
            .agg(F.min(F.when(F.col("event_type") == "signup",
                              F.col("w"))).cast("int")
                 .alias("cohort_week"),
                 F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), w))")
                 .alias("week_mask")))


def run_retention_fold(spark: SparkSession, arrivals_dir: str,
                       snap_dir: str, ckpt_dir: str) -> None:
    """Drain the arrivals dir folding per-user (MIN cohort week,
    OR week mask) into the snapshot chain. Resumable under the same
    checkpoint dir; a replayed batch recomputes from the PRIOR
    snapshot."""
    import os

    schema = spark.read.parquet(arrivals_dir).schema

    def _latest_before(batch_id: int) -> str:
        subs = sorted(d for d in os.listdir(snap_dir)
                      if d < f"{batch_id + 1:05d}_b")
        return os.path.join(snap_dir, subs[-1])

    def _process(batch_df, batch_id) -> None:
        prev_snap = spark.read.parquet(_latest_before(batch_id))
        merged = (prev_snap.unionByName(_retention_delta(batch_df))
                  .groupBy("user_id")
                  .agg(F.min("cohort_week").cast("int")
                       .alias("cohort_week"),
                       F.expr("bit_or(week_mask)").cast("bigint")
                       .alias("week_mask")))
        (merged.write.mode("overwrite")
         .parquet(os.path.join(snap_dir, f"{batch_id + 1:05d}_b")))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(arrivals_dir))
    q = (stream.writeStream.foreachBatch(_process)
         .option("checkpointLocation", ckpt_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def retention_from_state(snap: DataFrame) -> DataFrame:
    """Shared batch tail: derive the (cohort_week, week_offset,
    n_users) matrix from the folded per-user state — identical output
    to the single-shot events_retention_cohorts query (shared
    oracle)."""
    active = (snap.where(F.col("cohort_week").isNotNull())
              .select("cohort_week",
                      F.explode(F.expr(
                          f"filter(sequence(0, {_RET_MAX_WEEK}), "
                          "w -> (week_mask >> w) % 2 = 1)"))
                      .alias("active_week")))
    return (active.where(F.col("active_week") >= F.col("cohort_week"))
            .groupBy(F.col("cohort_week").cast("int")
                     .alias("cohort_week"),
                     (F.col("active_week") - F.col("cohort_week"))
                     .cast("int").alias("week_offset"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users")))


def _run_masked_fold(spark: SparkSession, sf_dir: str, key_tag: str,
                     _query_name: str, n_batches: int) -> DataFrame:
    """Shared driver for the MIN/OR mask-fold twins (retention,
    lifecycle — r11 review: the workdir/staging/drain dance was pasted
    twice): stage event_id-contiguous arrivals, drain the fold, return
    the FINAL per-user (cohort_week, week_mask) snapshot. Each twin
    applies its own tail to the same state shape.

    Supersede-on-reinvoke contract: same as streaming_bottomk_sample."""
    import atexit
    import os
    import shutil
    import tempfile

    from iq_to_hdl_migration_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type")

    wkey = (spark.sparkContext.applicationId,
            os.path.abspath(sf_dir), key_tag)
    prev = _STREAM_WORK_DIRS.pop(wkey, None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    work = tempfile.mkdtemp(prefix=f"{_query_name}_")
    _STREAM_WORK_DIRS[wkey] = work
    arrivals_dir = os.path.join(work, "arrivals")
    snap_dir = os.path.join(work, "snaps")
    ckpt_dir = os.path.join(work, "ckpt")
    os.makedirs(arrivals_dir)
    os.makedirs(snap_dir)
    atexit.register(shutil.rmtree, work, ignore_errors=True)

    empty = spark.createDataFrame([], RETENTION_STATE_SCHEMA)
    empty.write.parquet(os.path.join(snap_dir, "00000_init"))

    lo, hi = _id_span(ev, "event_id")
    if hi is not None:
        _stage_id_sliced_arrivals(ev, "event_id", lo, hi, n_batches,
                                  work, arrivals_dir)
        run_retention_fold(spark, arrivals_dir, snap_dir, ckpt_dir)

    final = sorted(os.listdir(snap_dir))[-1]
    return spark.read.parquet(os.path.join(snap_dir, final))


def streaming_retention_cohorts(spark: SparkSession, sf_dir: str,
                                _query_name: str = "stream_retention",
                                n_batches: int = 4) -> DataFrame:
    """Streaming twin of events_retention_cohorts: events arrive as
    event_id-contiguous micro-batches (a user's signup and activity
    deliberately SPAN batches); per-user state folds with the MIN/OR
    monoid pair above, and the final snapshot feeds the same cohort
    tail as the batch query — bit-for-bit equality (shared oracle)."""
    snap = _run_masked_fold(spark, sf_dir, "retention", _query_name,
                            n_batches)
    return retention_from_state(snap)


def streaming_lifecycle_stages(spark: SparkSession, sf_dir: str,
                               _query_name: str = "stream_lifecycle",
                               n_batches: int = 4) -> DataFrame:
    """Streaming twin of events_lifecycle_stages (17th twin): the SAME
    per-user (MIN cohort week, OR active-week bitmask) fold as the
    retention twin — growth accounting needs only the mask half — with
    the final snapshot's masks exploded back into a distinct user-week
    frame and fed through the shared batch tail
    (events_queries.lifecycle_from_user_weeks). One fold shape, two
    registered reports: the state design is the point (a single BIGINT
    mask per user carries both cohort retention AND lifecycle
    classification exactly)."""
    from iq_to_hdl_migration_spark.queries.events_queries import (
        lifecycle_from_user_weeks)

    snap = _run_masked_fold(spark, sf_dir, "lifecycle", _query_name,
                            n_batches)
    return lifecycle_from_user_weeks(user_weeks_from_state(snap))


def user_weeks_from_state(snap: DataFrame) -> DataFrame:
    """Explode the folded week bitmask back into the DISTINCT
    (user_id, week) frame the batch tails consume."""
    return snap.select(
        "user_id",
        F.explode(F.expr(
            f"filter(sequence(0, {_RET_MAX_WEEK}), "
            "w -> (week_mask >> w) % 2 = 1)")).alias("week"))


# ---------------------------------------------------------------------------
# Bot-cadence twin: per-user state = (n_events, n_gaps, n_subsec,
# n_night, last_us). Unlike the MIN/OR mask folds this is a
# SEAM-CARRYING left fold, not a commutative monoid: a user's
# inter-event gap can span two micro-batches, so each batch computes
# its within-batch gaps and then closes the one boundary gap against
# the carried last_us. Correct because (a) arrivals are
# event_id-contiguous and event ids are time-ordered per user
# (asserted in-plan below — the fold REFUSES data that breaks it), and
# (b) the snapshot chain replays batch i from snapshot i-1, so order
# and exactly-once both hold across restarts.
# ---------------------------------------------------------------------------

BOT_STATE_SCHEMA = ("user_id bigint, n_events bigint, n_gaps bigint, "
                    "n_subsec bigint, n_night bigint, last_us bigint")


def _bot_batch_delta(batch_df: DataFrame) -> DataFrame:
    """Per-user within-batch cadence stats + the batch's first/last
    event micros (for the boundary gap against the carried state)."""
    from pyspark.sql import Window as W_

    us = F.unix_micros(F.col("ts"))
    w = W_.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(us).over(w)
    o = batch_df.select("user_id", us.alias("us"),
                        prev.alias("prev_us"))
    return (o.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("d_events"),
                 F.sum(F.when(F.col("prev_us").isNotNull(), 1)
                       .otherwise(0)).cast("bigint").alias("d_gaps"),
                 F.sum(F.when(F.col("prev_us").isNotNull()
                              & ((F.col("us") - F.col("prev_us"))
                                 < 1_000_000), 1).otherwise(0))
                 .cast("bigint").alias("d_subsec"),
                 F.sum(F.when(F.expr("(us div 3600000000) % 24") < 6,
                              1).otherwise(0))
                 .cast("bigint").alias("d_night"),
                 F.min("us").cast("bigint").alias("first_us"),
                 F.max("us").cast("bigint").alias("d_last_us")))


def run_bot_count_fold(spark: SparkSession, arrivals_dir: str,
                       snap_dir: str, ckpt_dir: str) -> None:
    """Drain the arrivals dir folding per-user cadence counts with the
    boundary-gap carry. Resumable under the same checkpoint dir."""
    import os

    schema = spark.read.parquet(arrivals_dir).schema

    def _latest_before(batch_id: int) -> str:
        subs = sorted(d for d in os.listdir(snap_dir)
                      if d < f"{batch_id + 1:05d}_b")
        return os.path.join(snap_dir, subs[-1])

    def _process(batch_df, batch_id) -> None:
        prev_snap = spark.read.parquet(_latest_before(batch_id))
        delta = _bot_batch_delta(batch_df)
        # the ordered-fold contract: a batch's events must all be
        # LATER than the carried last_us (id-contiguous arrivals over
        # time-ordered ids guarantee it; anything else corrupts the
        # boundary gap, so refuse loudly)
        joined = prev_snap.join(delta, "user_id", "full")
        guarded = joined.withColumn(
            "first_us",
            F.when(F.col("last_us").isNotNull()
                   & F.col("first_us").isNotNull()
                   & (F.col("first_us") <= F.col("last_us")),
                   F.raise_error(F.concat(
                       F.lit("bot fold: batch not time-contiguous "
                             "for user_id="),
                       F.col("user_id").cast("string"))))
            .otherwise(F.col("first_us")))
        boundary = (F.col("last_us").isNotNull()
                    & F.col("first_us").isNotNull())
        bgap_subsec = F.when(
            boundary & ((F.col("first_us") - F.col("last_us"))
                        < 1_000_000), 1).otherwise(0)
        merged = guarded.select(
            "user_id",
            (F.coalesce("n_events", F.lit(0))
             + F.coalesce("d_events", F.lit(0))).cast("bigint")
            .alias("n_events"),
            (F.coalesce("n_gaps", F.lit(0))
             + F.coalesce("d_gaps", F.lit(0))
             + F.when(boundary, 1).otherwise(0)).cast("bigint")
            .alias("n_gaps"),
            (F.coalesce("n_subsec", F.lit(0))
             + F.coalesce("d_subsec", F.lit(0)) + bgap_subsec)
            .cast("bigint").alias("n_subsec"),
            (F.coalesce("n_night", F.lit(0))
             + F.coalesce("d_night", F.lit(0))).cast("bigint")
            .alias("n_night"),
            F.coalesce("d_last_us", "last_us").cast("bigint")
            .alias("last_us"))
        (merged.write.mode("overwrite")
         .parquet(os.path.join(snap_dir, f"{batch_id + 1:05d}_b")))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(arrivals_dir))
    q = (stream.writeStream.foreachBatch(_process)
         .option("checkpointLocation", ckpt_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def streaming_bot_score(spark: SparkSession, sf_dir: str,
                        _query_name: str = "stream_bot",
                        n_batches: int = 4) -> DataFrame:
    """Streaming twin of events_bot_score_report (18th twin): the
    seam-carrying cadence fold above, with the final snapshot fed
    through the shared report tail — equal to the single-shot batch
    report bit-for-bit (shared oracle).

    Supersede-on-reinvoke contract: same as streaming_bottomk_sample."""
    import atexit
    import os
    import shutil
    import tempfile

    from iq_to_hdl_migration_spark.queries.events_queries import (
        bot_report_from_counts)
    from iq_to_hdl_migration_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts")

    wkey = (spark.sparkContext.applicationId,
            os.path.abspath(sf_dir), "bot_score")
    prev = _STREAM_WORK_DIRS.pop(wkey, None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    work = tempfile.mkdtemp(prefix=f"{_query_name}_")
    _STREAM_WORK_DIRS[wkey] = work
    arrivals_dir = os.path.join(work, "arrivals")
    snap_dir = os.path.join(work, "snaps")
    ckpt_dir = os.path.join(work, "ckpt")
    os.makedirs(arrivals_dir)
    os.makedirs(snap_dir)
    atexit.register(shutil.rmtree, work, ignore_errors=True)

    empty = spark.createDataFrame([], BOT_STATE_SCHEMA)
    empty.write.parquet(os.path.join(snap_dir, "00000_init"))

    lo, hi = _id_span(ev, "event_id")
    if hi is not None:
        _stage_id_sliced_arrivals(ev, "event_id", lo, hi, n_batches,
                                  work, arrivals_dir)
        run_bot_count_fold(spark, arrivals_dir, snap_dir, ckpt_dir)

    final = sorted(os.listdir(snap_dir))[-1]
    snap = spark.read.parquet(os.path.join(snap_dir, final))
    return bot_report_from_counts(snap.drop("last_us"))


# ---------------------------------------------------------------------------
# Type-diversity twin: per-user-per-type counts are the same additive
# count monoid as the Gini fold, just keyed on (user_id, event_type)
# — state is one BIGINT per (user, type) pair, bounded by the type
# vocabulary (small and fixed), so the snapshot grows with distinct
# users, not with events. The Simpson-concentration banding is NOT
# incremental (a ratio of sums of squares is not mergeable); the final
# snapshot feeds the same integer-exact tail as the batch query.
# ---------------------------------------------------------------------------

def run_keyed_count_fold(spark: SparkSession, arrivals_dir: str,
                         snap_dir: str, ckpt_dir: str,
                         keys: list[str]) -> None:
    """run_user_count_fold generalized to a composite key: drain the
    arrivals dir folding each batch's per-key row counts into the
    snapshot chain (merge = sum per key — the additive count monoid).
    Replay-safe: a replayed batch recomputes from the PRIOR snapshot,
    so re-execution rewrites its snapshot byte-identically."""
    import os

    schema = spark.read.parquet(arrivals_dir).schema

    def _latest_before(batch_id: int) -> str:
        subs = sorted(d for d in os.listdir(snap_dir)
                      if d < f"{batch_id + 1:05d}_b")
        return os.path.join(snap_dir, subs[-1])

    def _process(batch_df, batch_id) -> None:
        prev_snap = spark.read.parquet(_latest_before(batch_id))
        delta = (batch_df.groupBy(*keys)
                 .agg(F.count(F.lit(1)).cast("bigint").alias("n_events")))
        merged = (prev_snap.unionByName(delta)
                  .groupBy(*keys)
                  .agg(F.sum("n_events").cast("bigint").alias("n_events")))
        (merged.write.mode("overwrite")
         .parquet(os.path.join(snap_dir, f"{batch_id + 1:05d}_b")))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(arrivals_dir))
    q = (stream.writeStream.foreachBatch(_process)
         .option("checkpointLocation", ckpt_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def streaming_type_diversity(spark: SparkSession, sf_dir: str,
                             _query_name: str = "stream_diversity",
                             n_batches: int = 4) -> DataFrame:
    """Streaming twin of events_user_type_diversity: events arrive as
    event_id-contiguous micro-batches (a user's events deliberately
    SPAN batches) and each batch folds per-(user, type) counts into a
    snapshot via run_keyed_count_fold. The final snapshot feeds the
    SAME integer-exact Simpson-concentration tail as the batch query,
    so the report equals the single-shot result bit-for-bit (shared
    oracle). Supersede-on-reinvoke contract: same as
    streaming_bottomk_sample."""
    import atexit
    import os
    import shutil
    import tempfile

    from iq_to_hdl_migration_spark.queries.events_queries import (
        diversity_from_type_counts)
    from iq_to_hdl_migration_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type")

    wkey = (spark.sparkContext.applicationId,
            os.path.abspath(sf_dir), "type_diversity")
    prev = _STREAM_WORK_DIRS.pop(wkey, None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    work = tempfile.mkdtemp(prefix=f"{_query_name}_")
    _STREAM_WORK_DIRS[wkey] = work
    arrivals_dir = os.path.join(work, "arrivals")
    snap_dir = os.path.join(work, "snaps")
    ckpt_dir = os.path.join(work, "ckpt")
    os.makedirs(arrivals_dir)
    os.makedirs(snap_dir)
    atexit.register(shutil.rmtree, work, ignore_errors=True)

    empty = spark.createDataFrame(
        [], "user_id bigint, event_type string, n_events bigint")
    empty.write.parquet(os.path.join(snap_dir, "00000_init"))

    lo, hi = _id_span(ev, "event_id")
    if hi is None:
        snap = spark.read.parquet(os.path.join(snap_dir, "00000_init"))
        return diversity_from_type_counts(snap)
    _stage_id_sliced_arrivals(ev, "event_id", lo, hi, n_batches,
                              work, arrivals_dir)

    run_keyed_count_fold(spark, arrivals_dir, snap_dir, ckpt_dir,
                         ["user_id", "event_type"])

    final = sorted(os.listdir(snap_dir))[-1]
    snap = spark.read.parquet(os.path.join(snap_dir, final))
    return diversity_from_type_counts(snap)


# ---------------------------------------------------------------------------
# Gap-histogram twin: the second SEAM-CARRYING fold. Inter-event gaps
# per (user, event_type) are not a commutative monoid — a gap can span
# two micro-batches — so each batch closes the boundary gap against
# the carried last-event micros, exactly the bot fold's discipline,
# but the state is a bounded HISTOGRAM per key (≤ ~40 power-of-two
# buckets) instead of scalar counters: one parquet snapshot holds
# histogram rows (gap_bucket set, last_us NULL) and one seam row per
# (user, type) (gap_bucket NULL, last_us set). Like the bot fold it
# asserts time-contiguity in-plan and refuses out-of-order arrivals.
# ---------------------------------------------------------------------------

GAP_HIST_STATE_SCHEMA = ("user_id bigint, event_type string, "
                         "gap_bucket int, n_gaps bigint, last_us bigint")

_GAP_BUCKET_SQL = ("CAST(CASE WHEN gap_us <= 0 THEN 0 "
                   "ELSE length(bin(gap_us div 1000000)) END AS INT)")


def run_gap_hist_fold(spark: SparkSession, arrivals_dir: str,
                      snap_dir: str, ckpt_dir: str) -> None:
    """Drain the arrivals dir folding per-(user, type) gap-bucket
    histograms with the boundary-gap carry. Resumable under the same
    checkpoint dir; a replayed batch recomputes from the PRIOR
    snapshot, so re-execution rewrites its snapshot byte-identically."""
    import os

    from pyspark.sql import Window as W_

    schema = spark.read.parquet(arrivals_dir).schema

    def _latest_before(batch_id: int) -> str:
        subs = sorted(d for d in os.listdir(snap_dir)
                      if d < f"{batch_id + 1:05d}_b")
        return os.path.join(snap_dir, subs[-1])

    def _process(batch_df, batch_id) -> None:
        prev = spark.read.parquet(_latest_before(batch_id))
        prev_hist = (prev.where(F.col("gap_bucket").isNotNull())
                     .select("user_id", "event_type", "gap_bucket",
                             "n_gaps"))
        prev_seam = (prev.where(F.col("gap_bucket").isNull())
                     .select("user_id", "event_type", "last_us"))

        us = F.unix_micros(F.col("ts"))
        w = W_.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        o = batch_df.select("user_id", "event_type", us.alias("us"),
                            F.lag(us).over(w).alias("prev_us"))
        d_hist = (o.where(F.col("prev_us").isNotNull())
                  .withColumn("gap_us", F.col("us") - F.col("prev_us"))
                  .select("user_id", "event_type",
                          F.expr(_GAP_BUCKET_SQL).alias("gap_bucket"))
                  .groupBy("user_id", "event_type", "gap_bucket")
                  .agg(F.count(F.lit(1)).cast("bigint").alias("n_gaps")))
        spans = (o.groupBy("user_id", "event_type")
                 .agg(F.min("us").cast("bigint").alias("first_us"),
                      F.max("us").cast("bigint").alias("d_last_us")))

        # ordered-fold contract: refuse non-contiguous arrivals loudly
        joined = prev_seam.join(spans, ["user_id", "event_type"], "full")
        guarded = joined.withColumn(
            "first_us",
            F.when(F.col("last_us").isNotNull()
                   & F.col("first_us").isNotNull()
                   & (F.col("first_us") <= F.col("last_us")),
                   F.raise_error(F.concat(
                       F.lit("gap fold: batch not time-contiguous "
                             "for user_id="),
                       F.col("user_id").cast("string"))))
            .otherwise(F.col("first_us")))
        boundary = (guarded
                    .where(F.col("last_us").isNotNull()
                           & F.col("first_us").isNotNull())
                    .withColumn("gap_us",
                                F.col("first_us") - F.col("last_us"))
                    .select("user_id", "event_type",
                            F.expr(_GAP_BUCKET_SQL).alias("gap_bucket"),
                            F.lit(1).cast("bigint").alias("n_gaps")))
        new_hist = (prev_hist.unionByName(d_hist).unionByName(boundary)
                    .groupBy("user_id", "event_type", "gap_bucket")
                    .agg(F.sum("n_gaps").cast("bigint").alias("n_gaps")))
        new_seam = guarded.select(
            "user_id", "event_type",
            F.coalesce("d_last_us", "last_us").cast("bigint")
            .alias("last_us"))

        snap = (new_hist
                .withColumn("last_us", F.lit(None).cast("bigint"))
                .unionByName(new_seam
                             .withColumn("gap_bucket",
                                         F.lit(None).cast("int"))
                             .withColumn("n_gaps",
                                         F.lit(None).cast("bigint"))
                             .select("user_id", "event_type",
                                     "gap_bucket", "n_gaps", "last_us")))
        (snap.write.mode("overwrite")
         .parquet(os.path.join(snap_dir, f"{batch_id + 1:05d}_b")))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(arrivals_dir))
    q = (stream.writeStream.foreachBatch(_process)
         .option("checkpointLocation", ckpt_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def streaming_gap_histogram(spark: SparkSession, sf_dir: str,
                            _query_name: str = "stream_gap_hist",
                            n_batches: int = 4) -> DataFrame:
    """Streaming twin of events_gap_powerlaw_histogram: the
    seam-carrying histogram fold above; the final snapshot's histogram
    rows collapse onto (event_type, bucket) — the same report as the
    single-shot batch query, bit-for-bit (shared oracle).

    Supersede-on-reinvoke contract: same as streaming_bottomk_sample."""
    import atexit
    import os
    import shutil
    import tempfile

    from iq_to_hdl_migration_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts")

    wkey = (spark.sparkContext.applicationId,
            os.path.abspath(sf_dir), "gap_hist")
    prev = _STREAM_WORK_DIRS.pop(wkey, None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    work = tempfile.mkdtemp(prefix=f"{_query_name}_")
    _STREAM_WORK_DIRS[wkey] = work
    arrivals_dir = os.path.join(work, "arrivals")
    snap_dir = os.path.join(work, "snaps")
    ckpt_dir = os.path.join(work, "ckpt")
    os.makedirs(arrivals_dir)
    os.makedirs(snap_dir)
    atexit.register(shutil.rmtree, work, ignore_errors=True)

    empty = spark.createDataFrame([], GAP_HIST_STATE_SCHEMA)
    empty.write.parquet(os.path.join(snap_dir, "00000_init"))

    lo, hi = _id_span(ev, "event_id")
    if hi is not None:
        _stage_id_sliced_arrivals(ev, "event_id", lo, hi, n_batches,
                                  work, arrivals_dir)
        run_gap_hist_fold(spark, arrivals_dir, snap_dir, ckpt_dir)

    final = sorted(os.listdir(snap_dir))[-1]
    snap = spark.read.parquet(os.path.join(snap_dir, final))
    return (snap.where(F.col("gap_bucket").isNotNull())
            .groupBy("event_type",
                     F.col("gap_bucket").alias("gap_bucket_log2s"))
            .agg(F.sum("n_gaps").cast("bigint").alias("n_gaps")))


# ---------------------------------------------------------------------------
# Ordered-funnel twin: the third ORDERED fold. The chained funnel
# (view -> later click -> later purchase) is not a commutative monoid
# — a stage's qualifying time depends on the previous stage's — but
# under the arrival contract (event_id-contiguous micro-batches over
# time-ordered ids, the same contract the bot and gap folds assert),
# a stage time is FINAL the moment it is set: every later batch's
# events are strictly later, so coalesce(carried, batch-candidate) is
# exact. State is three timestamps + the seam last_us per user.
# Within a batch the three stages chain exactly like the batch query,
# each constrained by the stage time resolved so far.
# ---------------------------------------------------------------------------

FUNNEL_STATE_SCHEMA = ("user_id bigint, t_view_us bigint, "
                       "t_click_us bigint, t_buy_us bigint, last_us bigint")


def run_funnel_fold(spark: SparkSession, arrivals_dir: str,
                    snap_dir: str, ckpt_dir: str) -> None:
    """Drain the arrivals dir folding per-user ordered-funnel stage
    times. Replay-safe: a replayed batch recomputes from the PRIOR
    snapshot; refuses non-contiguous arrivals loudly."""
    import os

    schema = spark.read.parquet(arrivals_dir).schema

    def _latest_before(batch_id: int) -> str:
        subs = sorted(d for d in os.listdir(snap_dir)
                      if d < f"{batch_id + 1:05d}_b")
        return os.path.join(snap_dir, subs[-1])

    def _process(batch_df, batch_id) -> None:
        prev = spark.read.parquet(_latest_before(batch_id))
        us = F.unix_micros(F.col("ts"))
        b = batch_df.select("user_id", "event_type", us.alias("us"))
        per_user = (b.groupBy("user_id")
                    .agg(F.min(F.when(F.col("event_type") == "view",
                                      F.col("us"))).alias("bv"),
                         F.min("us").cast("bigint").alias("first_us"),
                         F.max("us").cast("bigint").alias("d_last_us")))
        joined = prev.join(per_user, "user_id", "full")
        # the guard must ride a column the fold actually consumes
        # (d_last_us feeds every snapshot row's last_us), or column
        # pruning would silently drop the raise_error
        guarded = joined.withColumn(
            "d_last_us",
            F.when(F.col("last_us").isNotNull()
                   & F.col("first_us").isNotNull()
                   & (F.col("first_us") <= F.col("last_us")),
                   F.raise_error(F.concat(
                       F.lit("funnel fold: batch not time-contiguous "
                             "for user_id="),
                       F.col("user_id").cast("string"))))
            .otherwise(F.col("d_last_us")))
        s1 = guarded.select(
            "user_id", "t_click_us", "t_buy_us",
            F.coalesce("t_view_us", "bv").cast("bigint")
            .alias("t_view_us"),
            F.coalesce("d_last_us", "last_us").cast("bigint")
            .alias("last_us"))
        # stage 2: first click strictly after the resolved view time
        clicks = (b.where(F.col("event_type") == "click")
                  .join(s1.select("user_id", "t_view_us"), "user_id")
                  .where(F.col("t_view_us").isNotNull()
                         & (F.col("us") > F.col("t_view_us")))
                  .groupBy("user_id")
                  .agg(F.min("us").cast("bigint").alias("bc")))
        s2 = (s1.join(clicks, "user_id", "left")
              .select("user_id", "t_view_us", "t_buy_us", "last_us",
                      F.coalesce("t_click_us", "bc").cast("bigint")
                      .alias("t_click_us")))
        buys = (b.where(F.col("event_type") == "purchase")
                .join(s2.select("user_id", "t_click_us"), "user_id")
                .where(F.col("t_click_us").isNotNull()
                       & (F.col("us") > F.col("t_click_us")))
                .groupBy("user_id")
                .agg(F.min("us").cast("bigint").alias("bb")))
        s3 = (s2.join(buys, "user_id", "left")
              .select("user_id", "t_view_us", "t_click_us",
                      F.coalesce("t_buy_us", "bb").cast("bigint")
                      .alias("t_buy_us"),
                      "last_us"))
        (s3.select("user_id", "t_view_us", "t_click_us", "t_buy_us",
                   "last_us")
         .write.mode("overwrite")
         .parquet(os.path.join(snap_dir, f"{batch_id + 1:05d}_b")))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(arrivals_dir))
    q = (stream.writeStream.foreachBatch(_process)
         .option("checkpointLocation", ckpt_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def funnel_counts_from_state(snap: DataFrame) -> DataFrame:
    """Final snapshot -> the 1-row funnel report (shared tail shape
    with events_funnel_counts)."""
    return snap.agg(
        F.sum(F.when(F.col("t_view_us").isNotNull(), 1).otherwise(0))
        .cast("bigint").alias("n_view"),
        F.sum(F.when(F.col("t_click_us").isNotNull(), 1).otherwise(0))
        .cast("bigint").alias("n_view_click"),
        F.sum(F.when(F.col("t_buy_us").isNotNull(), 1).otherwise(0))
        .cast("bigint").alias("n_view_click_buy"))


def streaming_funnel_counts(spark: SparkSession, sf_dir: str,
                            _query_name: str = "stream_funnel",
                            n_batches: int = 4) -> DataFrame:
    """Streaming twin of events_funnel_counts: the ordered-funnel fold
    above; equal to the single-shot batch report bit-for-bit (shared
    oracle). Supersede-on-reinvoke contract: same as
    streaming_bottomk_sample."""
    import atexit
    import os
    import shutil
    import tempfile

    from iq_to_hdl_migration_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts")

    wkey = (spark.sparkContext.applicationId,
            os.path.abspath(sf_dir), "funnel")
    prev = _STREAM_WORK_DIRS.pop(wkey, None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    work = tempfile.mkdtemp(prefix=f"{_query_name}_")
    _STREAM_WORK_DIRS[wkey] = work
    arrivals_dir = os.path.join(work, "arrivals")
    snap_dir = os.path.join(work, "snaps")
    ckpt_dir = os.path.join(work, "ckpt")
    os.makedirs(arrivals_dir)
    os.makedirs(snap_dir)
    atexit.register(shutil.rmtree, work, ignore_errors=True)

    empty = spark.createDataFrame([], FUNNEL_STATE_SCHEMA)
    empty.write.parquet(os.path.join(snap_dir, "00000_init"))

    lo, hi = _id_span(ev, "event_id")
    if hi is not None:
        _stage_id_sliced_arrivals(ev, "event_id", lo, hi, n_batches,
                                  work, arrivals_dir)
        run_funnel_fold(spark, arrivals_dir, snap_dir, ckpt_dir)

    final = sorted(os.listdir(snap_dir))[-1]
    snap = spark.read.parquet(os.path.join(snap_dir, final))
    return funnel_counts_from_state(snap)


def streaming_dau_wau(spark: SparkSession, sf_dir: str,
                      _query_name: str = "stream_dau_wau",
                      n_batches: int = 4) -> DataFrame:
    """Streaming twin of events_dau_wau, riding the generalized
    composite-key count fold: per-(user, day) counts are the additive
    count monoid, and DAU/WAU need only the DISTINCT (user, day)
    presence — which the count snapshot carries for free (count >= 1).
    State is one row per active (user, day) pair — the same frame the
    batch query shuffles once. Final snapshot feeds the shared tail,
    so the report equals the single-shot batch result bit-for-bit
    (shared oracle). Supersede-on-reinvoke contract: same as
    streaming_bottomk_sample."""
    import atexit
    import os
    import shutil
    import tempfile

    from iq_to_hdl_migration_spark.queries.events_queries import (
        dau_wau_from_user_days)
    from iq_to_hdl_migration_spark.sources.tables import load_table

    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "user_id", F.to_date("ts").alias("day")))

    wkey = (spark.sparkContext.applicationId,
            os.path.abspath(sf_dir), "dau_wau")
    prev = _STREAM_WORK_DIRS.pop(wkey, None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    work = tempfile.mkdtemp(prefix=f"{_query_name}_")
    _STREAM_WORK_DIRS[wkey] = work
    arrivals_dir = os.path.join(work, "arrivals")
    snap_dir = os.path.join(work, "snaps")
    ckpt_dir = os.path.join(work, "ckpt")
    os.makedirs(arrivals_dir)
    os.makedirs(snap_dir)
    atexit.register(shutil.rmtree, work, ignore_errors=True)

    empty = spark.createDataFrame(
        [], "user_id bigint, day date, n_events bigint")
    empty.write.parquet(os.path.join(snap_dir, "00000_init"))

    lo, hi = _id_span(ev, "event_id")
    if hi is None:
        snap = spark.read.parquet(os.path.join(snap_dir, "00000_init"))
        return dau_wau_from_user_days(snap.select("user_id", "day"))
    _stage_id_sliced_arrivals(ev, "event_id", lo, hi, n_batches,
                              work, arrivals_dir)

    run_keyed_count_fold(spark, arrivals_dir, snap_dir, ckpt_dir,
                         ["user_id", "day"])

    final = sorted(os.listdir(snap_dir))[-1]
    snap = spark.read.parquet(os.path.join(snap_dir, final))
    return dau_wau_from_user_days(snap.select("user_id", "day"))


def streaming_type_mix_drift(spark: SparkSession, sf_dir: str,
                             _query_name: str = "stream_mix_drift",
                             n_batches: int = 4) -> DataFrame:
    """Streaming twin of events_type_mix_drift_tvd, riding the
    generalized composite-key count fold on (week, event_type): the
    weekly type-count matrix is the additive count monoid, bounded by
    weeks x the fixed type vocabulary — the cheapest state of any twin.
    The final snapshot feeds the SAME exact-integer TVD tail as the
    batch query, so the drift report equals the single-shot result
    bit-for-bit (shared oracle). Supersede-on-reinvoke contract: same
    as streaming_bottomk_sample."""
    import atexit
    import os
    import shutil
    import tempfile

    from iq_to_hdl_migration_spark.queries.events_queries import (
        type_mix_drift_from_counts)
    from iq_to_hdl_migration_spark.sources.tables import load_table

    week = (F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
            / 7).cast("int")
    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", week.alias("week"), "event_type"))

    wkey = (spark.sparkContext.applicationId,
            os.path.abspath(sf_dir), "type_mix_drift")
    prev = _STREAM_WORK_DIRS.pop(wkey, None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    work = tempfile.mkdtemp(prefix=f"{_query_name}_")
    _STREAM_WORK_DIRS[wkey] = work
    arrivals_dir = os.path.join(work, "arrivals")
    snap_dir = os.path.join(work, "snaps")
    ckpt_dir = os.path.join(work, "ckpt")
    os.makedirs(arrivals_dir)
    os.makedirs(snap_dir)
    atexit.register(shutil.rmtree, work, ignore_errors=True)

    empty = spark.createDataFrame(
        [], "week int, event_type string, n_events bigint")
    empty.write.parquet(os.path.join(snap_dir, "00000_init"))

    lo, hi = _id_span(ev, "event_id")
    if hi is None:
        snap = spark.read.parquet(os.path.join(snap_dir, "00000_init"))
        return type_mix_drift_from_counts(
            snap.select("week", "event_type",
                        F.col("n_events").alias("o")))
    _stage_id_sliced_arrivals(ev, "event_id", lo, hi, n_batches,
                              work, arrivals_dir)

    run_keyed_count_fold(spark, arrivals_dir, snap_dir, ckpt_dir,
                         ["week", "event_type"])

    final = sorted(os.listdir(snap_dir))[-1]
    snap = spark.read.parquet(os.path.join(snap_dir, final))
    return type_mix_drift_from_counts(
        snap.select("week", "event_type", F.col("n_events").alias("o")))


def streaming_haar_energy(spark: SparkSession, sf_dir: str,
                          _query_name: str = "stream_haar",
                          n_batches: int = 4) -> DataFrame:
    """Streaming twin of events_haar_energy_profile, riding the
    generalized composite-key count fold on (event_type, epoch-hour):
    the hourly count spine is the additive count monoid bounded by
    hours x the fixed type vocabulary, and the final snapshot feeds
    the SAME exact-integer Haar tail, so the multi-resolution energy
    spectrum equals the single-shot result bit-for-bit (shared
    oracle). Supersede-on-reinvoke contract: same as
    streaming_bottomk_sample."""
    import atexit
    import os
    import shutil
    import tempfile

    from iq_to_hdl_migration_spark.queries.events_queries import (
        haar_energy_from_hourly)
    from iq_to_hdl_migration_spark.sources.tables import load_table

    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "event_type",
                  F.expr("unix_micros(ts) div 3600000000").alias("h")))

    wkey = (spark.sparkContext.applicationId,
            os.path.abspath(sf_dir), "haar_energy")
    prev = _STREAM_WORK_DIRS.pop(wkey, None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    work = tempfile.mkdtemp(prefix=f"{_query_name}_")
    _STREAM_WORK_DIRS[wkey] = work
    arrivals_dir = os.path.join(work, "arrivals")
    snap_dir = os.path.join(work, "snaps")
    ckpt_dir = os.path.join(work, "ckpt")
    os.makedirs(arrivals_dir)
    os.makedirs(snap_dir)
    atexit.register(shutil.rmtree, work, ignore_errors=True)

    empty = spark.createDataFrame(
        [], "event_type string, h bigint, n_events bigint")
    empty.write.parquet(os.path.join(snap_dir, "00000_init"))

    lo, hi = _id_span(ev, "event_id")
    if hi is None:
        snap = spark.read.parquet(os.path.join(snap_dir, "00000_init"))
        return haar_energy_from_hourly(
            snap.select("event_type", "h", F.col("n_events").alias("c")))
    _stage_id_sliced_arrivals(ev, "event_id", lo, hi, n_batches,
                              work, arrivals_dir)

    run_keyed_count_fold(spark, arrivals_dir, snap_dir, ckpt_dir,
                         ["event_type", "h"])

    final = sorted(os.listdir(snap_dir))[-1]
    snap = spark.read.parquet(os.path.join(snap_dir, final))
    return haar_energy_from_hourly(
        snap.select("event_type", "h", F.col("n_events").alias("c")))


def streaming_fano_factor(spark: SparkSession, sf_dir: str,
                          _query_name: str = "stream_fano",
                          n_batches: int = 4) -> DataFrame:
    """Streaming twin of events_fano_factor_hourly, riding the SAME
    generalized composite-key count fold as the Haar twin (the
    (event_type, epoch-hour) count spine is the additive count
    monoid): the final snapshot feeds the shared exact-integer Fano
    tail (`fano_from_hourly`), whose spine bounds derive from the
    counts themselves, so the dispersion report equals the single-shot
    result bit-for-bit. Supersede-on-reinvoke contract: same as
    streaming_bottomk_sample."""
    import atexit
    import os
    import shutil
    import tempfile

    from iq_to_hdl_migration_spark.queries.events_queries import (
        fano_from_hourly)
    from iq_to_hdl_migration_spark.sources.tables import load_table

    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "event_type",
                  F.expr("unix_micros(ts) div 3600000000").alias("h")))

    wkey = (spark.sparkContext.applicationId,
            os.path.abspath(sf_dir), "fano_factor")
    prev = _STREAM_WORK_DIRS.pop(wkey, None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    work = tempfile.mkdtemp(prefix=f"{_query_name}_")
    _STREAM_WORK_DIRS[wkey] = work
    arrivals_dir = os.path.join(work, "arrivals")
    snap_dir = os.path.join(work, "snaps")
    ckpt_dir = os.path.join(work, "ckpt")
    os.makedirs(arrivals_dir)
    os.makedirs(snap_dir)
    atexit.register(shutil.rmtree, work, ignore_errors=True)

    empty = spark.createDataFrame(
        [], "event_type string, h bigint, n_events bigint")
    empty.write.parquet(os.path.join(snap_dir, "00000_init"))

    lo, hi = _id_span(ev, "event_id")
    if hi is None:
        snap = spark.read.parquet(os.path.join(snap_dir, "00000_init"))
        return fano_from_hourly(
            snap.select("event_type", "h",
                        F.col("n_events").alias("c")), step=1)
    _stage_id_sliced_arrivals(ev, "event_id", lo, hi, n_batches,
                              work, arrivals_dir)

    run_keyed_count_fold(spark, arrivals_dir, snap_dir, ckpt_dir,
                         ["event_type", "h"])

    final = sorted(os.listdir(snap_dir))[-1]
    snap = spark.read.parquet(os.path.join(snap_dir, final))
    return fano_from_hourly(
        snap.select("event_type", "h", F.col("n_events").alias("c")),
        step=1)
