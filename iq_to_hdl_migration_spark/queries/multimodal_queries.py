"""Registered multimodal queries over `documents`-as-binary (brief:
multimodal columns). Hash-checked: the pandas-UDF pipeline's sha256 /
chunking is reproduced in the DuckDB oracle over the same UTF-8 bytes,
so the mapInPandas plumbing itself is value-verified end-to-end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iq_to_hdl_migration_spark.operators import multimodal as mm
from iq_to_hdl_migration_spark.queries import register
from iq_to_hdl_migration_spark.sources.tables import load_table


@register(
    "mm_binary_features",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           'image/fake' AS media_type,
           CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
           sha256(text) AS sha256,
           CAST(64 + (ascii(substr(text, 1, 1)) % 512) AS INTEGER)
               AS fake_width,
           CAST(64 + (octet_length(encode(text)) % 480) AS INTEGER)
               AS fake_height
    FROM documents
    """,
    doc="binary-column feature extraction via Arrow mapInPandas "
        "(decode stubbed with a deterministic fake; plumbing real)",
)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mm.extract_features(mm.attach_binary_payload(docs))


@register(
    "mm_frame_samples",
    oracle="""
    WITH params AS (
        -- documents text is ASCII, so VARCHAR substr == byte slicing
        SELECT doc_id, text AS b,
               CAST(CEIL(length(text) / 4.0) AS INTEGER) AS step
        FROM documents
    ),
    frames AS (
        SELECT doc_id, i AS frame_idx,
               sha256(substr(b, 1 + i * step, step)) AS frame_sha256,
               length(substr(b, 1 + i * step, step)) AS chunk_len
        FROM params CROSS JOIN (SELECT unnest(range(0, 4)) AS i) t
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(frame_idx AS INTEGER) AS frame_idx, frame_sha256
    FROM frames WHERE chunk_len > 0
    """,
    doc="video-style frame sampling: per-payload chunk fingerprints "
        "(one output row per frame via mapInPandas)",
)
def mm_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mm.frame_sample(mm.attach_binary_payload(docs), n_frames=4)


@register(
    "mm_audio_chunks",
    oracle="""
    SELECT doc_id,
           CAST((n_chars + 1023) // 1024 AS BIGINT) AS n_chunks,
           CAST(n_chars AS BIGINT) AS total_bytes
    FROM documents WHERE doc_id < 200
    """,
    doc="audio-style chunked featurization (fixed 1 KiB chunks over the "
        "binary payload via mapInPandas); the oracle checks the chunk "
        "arithmetic exactly — ceil(n_chars/1024) chunks covering every "
        "byte — since text payload length == n_chars",
)
def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    feats = mm.audio_chunk_features(mm.attach_binary_payload(docs))
    return (feats.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.sum("n_bytes").cast("bigint").alias("total_bytes")))


@register(
    "mm_resize_meta",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(224 AS INTEGER) AS width,
           CAST(224 AS INTEGER) AS height,
           CAST(784 AS BIGINT) AS bytes_per_image
    FROM documents WHERE doc_id < 200
    """,
    doc="binary-in/binary-out resize stub: every output payload is the "
        "fixed 224x224 target (784 stub bytes); oracle checks the "
        "contract a real resampler must satisfy (uniform output shape)",
)
def mm_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    resized = mm.resize_stub(mm.attach_binary_payload(docs))
    return (resized
            .select("width", "height", F.length("payload").alias("blen"))
            .groupBy("width", "height", F.col("blen").alias("bytes_per_image"))
            .agg(F.count(F.lit(1)).alias("n_images"))
            .select("n_images", "width", "height",
                    F.col("bytes_per_image").cast("bigint")))


@register(
    "mm_payload_dedup_groups",
    oracle="""
    WITH h AS (
        SELECT doc_id, sha256(text) AS payload_sha256 FROM documents
    )
    SELECT payload_sha256,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_id
    FROM h
    GROUP BY payload_sha256
    """,
    doc="content-addressed media registry: every payload digest with "
        "its copy count and keeper id — the image/audio twin of text "
        "exact-dedup (hash-groupBy on sha256(payload), one shuffle on "
        "the digest, uniform by construction; n_copies > 1 rows are "
        "the dup groups a multimodal corpus build drops before "
        "perceptual hashing)",
)
def mm_payload_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = mm.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return (docs
            .select("doc_id", F.sha2("payload", 256).alias("payload_sha256"))
            .groupBy("payload_sha256")
            .agg(F.count(F.lit(1)).alias("n_copies"),
                 F.min("doc_id").alias("keeper_id")))


@register(
    "mm_content_histogram_neardup",
    oracle="""
    WITH ch AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
               list_transform(range(1, length(text) + 1),
                              i -> ord(substr(text, i, 1)) % 16) AS m
        FROM documents
    ),
    hist AS (
        SELECT doc_id, n_bytes,
               list_transform(range(0, 16),
                              b -> CAST(len(list_filter(m, c -> c = b))
                                        AS BIGINT)) AS hist
        FROM ch
    ),
    sig AS (
        SELECT doc_id, n_bytes, hist,
               list_transform(hist,
                              h -> h * 8 // greatest(n_bytes, 1)) AS sig
        FROM hist
    ),
    capped AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY sig ORDER BY doc_id)
                   AS rn
        FROM sig
    )
    SELECT CAST(a.doc_id AS BIGINT) AS id_a,
           CAST(b.doc_id AS BIGINT) AS id_b,
           list_dot_product(a.hist::DOUBLE[], b.hist::DOUBLE[])
             / (sqrt(list_dot_product(a.hist::DOUBLE[], a.hist::DOUBLE[]))
                * sqrt(list_dot_product(b.hist::DOUBLE[], b.hist::DOUBLE[])))
               AS cosine
    FROM capped a JOIN capped b
      ON a.sig = b.sig AND a.doc_id < b.doc_id
    WHERE a.rn <= 256 AND b.rn <= 256
      AND list_dot_product(a.hist::DOUBLE[], b.hist::DOUBLE[])
            / (sqrt(list_dot_product(a.hist::DOUBLE[], a.hist::DOUBLE[]))
               * sqrt(list_dot_product(b.hist::DOUBLE[], b.hist::DOUBLE[])))
          >= 0.999
    """,
    doc="multimodal -> similarity composition: Arrow-batched numpy "
        "feature extraction (16-bin byte histogram of the binary "
        "payload, mapInPandas — the real embedding-extractor plumbing "
        "with a deterministic feature) -> integer-quantized shape "
        "signature buckets (never all-pairs; per-bucket cap 256, the "
        "dedup family's flood discipline) -> exact cosine verify "
        "within buckets at >= 0.999. Near-identical media payloads "
        "land in the same quantized-shape bucket and verify; the "
        "whole pipeline, including the Python-extracted features, is "
        "value-hash-checked against a DuckDB restatement (ASCII "
        "payloads: byte histogram == codepoint histogram).",
)
def mm_content_histogram_neardup(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    from iq_to_hdl_migration_spark.operators import similarity as sim

    docs = mm.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    feats = mm.extract_byte_histogram(docs)
    sigd = feats.withColumn(
        "sig",
        F.expr("transform(hist, h -> (h * 8) div greatest(n_bytes, 1L))"))
    from pyspark.sql import Window
    w = Window.partitionBy("sig").orderBy("doc_id")
    capped = (sigd.withColumn("rn", F.row_number().over(w))
              .where(F.col("rn") <= 256)
              .withColumn("histd",
                          F.expr("transform(hist, h -> CAST(h AS DOUBLE))")))
    buckets = (capped.groupBy("sig")
               .agg(F.collect_list(F.struct("doc_id", "histd"))
                    .alias("members"))
               .where(F.size("members") > 1))
    pairs = (buckets.select(
        F.explode(F.expr("""
            flatten(transform(members, (x, i) ->
                transform(slice(members, i + 2, size(members)), y ->
                    struct(least(x.doc_id, y.doc_id) AS id_a,
                           greatest(x.doc_id, y.doc_id) AS id_b,
                           x.histd AS h_a, y.histd AS h_b))))
        """)).alias("p"))
        .select("p.id_a", "p.id_b", "p.h_a", "p.h_b"))
    cosine = (sim.dot_expr("h_a", "h_b")
              / (F.sqrt(sim.dot_expr("h_a", "h_a"))
                 * F.sqrt(sim.dot_expr("h_b", "h_b"))))
    return (pairs.withColumn("cosine", cosine)
            .where(F.col("cosine") >= 0.999)
            .select("id_a", "id_b", "cosine"))


@register(
    "mm_scene_cuts",
    oracle="""
    WITH params AS (
        -- documents text is ASCII, so VARCHAR substr == byte slicing
        -- and ord(char) == byte value
        SELECT doc_id, text AS b,
               CAST(CEIL(length(text) / 8.0) AS INTEGER) AS step
        FROM documents
    ),
    frames AS (
        SELECT doc_id, i, substr(b, 1 + i * step, step) AS chunk
        FROM params CROSS JOIN (SELECT unnest(range(0, 8)) AS i) t
        WHERE length(substr(b, 1 + i * step, step)) > 0
    ),
    chars AS (
        SELECT doc_id, i, chunk,
               unnest(range(1, length(chunk) + 1)) AS pos
        FROM frames
    ),
    hist0 AS (
        SELECT doc_id, i, ord(substr(chunk, pos, 1)) % 16 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM chars GROUP BY 1, 2, 3
    ),
    flen AS (SELECT doc_id, i, CAST(length(chunk) AS BIGINT) AS flen
             FROM frames),
    grid AS (
        SELECT f.doc_id, f.i, g.bucket FROM flen f
        CROSS JOIN (SELECT unnest(range(0, 16)) AS bucket) g
    ),
    dense AS (
        SELECT g.doc_id, g.i, g.bucket, COALESCE(h.c, 0) AS c
        FROM grid g LEFT JOIN hist0 h
          ON h.doc_id = g.doc_id AND h.i = g.i AND h.bucket = g.bucket
    ),
    l1 AS (
        SELECT a.doc_id, a.i AS boundary,
               CAST(SUM(ABS(a.c - b.c)) AS BIGINT) AS l1_delta
        FROM dense a JOIN dense b
          ON b.doc_id = a.doc_id AND b.i = a.i + 1
         AND b.bucket = a.bucket
        GROUP BY a.doc_id, a.i
    )
    SELECT CAST(l1.doc_id AS BIGINT) AS doc_id,
           CAST(l1.boundary AS INTEGER) AS boundary, l1.l1_delta,
           fa.flen AS len_a, fb.flen AS len_b,
           CAST(2 * l1.l1_delta >= fa.flen + fb.flen AS INTEGER)
               AS is_cut
    FROM l1 JOIN flen fa ON fa.doc_id = l1.doc_id
                        AND fa.i = l1.boundary
            JOIN flen fb ON fb.doc_id = l1.doc_id
                        AND fb.i = l1.boundary + 1
    """,
    doc="video-style scene-cut detection: 8 contiguous payload frames "
        "-> 16-bucket byte histograms (numpy over Arrow batches, the "
        "real frame-feature plumbing) -> integer L1 delta per "
        "consecutive boundary, cut when 2*l1 >= len_a+len_b — one row "
        "per boundary so the curation job can pick frames around "
        "cuts; pure-integer output, fully hash-checked",
)
def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mm.scene_cut_deltas(mm.attach_binary_payload(docs),
                               n_frames=8, bins=16)


@register(
    "mm_audio_vad_segments",
    oracle="""
    WITH params AS (
        -- ASCII text: substr == byte slicing, ord == byte value
        SELECT doc_id, text AS b FROM documents
    ),
    chunks AS (
        SELECT doc_id, i,
               substr(b, 1 + i * 32, 32) AS chunk
        FROM params CROSS JOIN (SELECT unnest(range(0, 64)) AS i) t
        WHERE length(substr(b, 1 + i * 32, 32)) > 0
    ),
    chars AS (
        SELECT doc_id, i, chunk,
               unnest(range(1, length(chunk) + 1)) AS pos
        FROM chunks
    ),
    csum AS (
        SELECT doc_id, i,
               CAST(SUM(ord(substr(chunk, pos, 1))) AS BIGINT) AS s,
               CAST(MAX(length(chunk)) AS BIGINT) AS ln
        FROM chars GROUP BY doc_id, i
    ),
    tot AS (
        SELECT doc_id, CAST(SUM(s) AS BIGINT) AS ts,
               CAST(SUM(ln) AS BIGINT) AS tl
        FROM csum GROUP BY doc_id
    ),
    act AS (
        SELECT c.doc_id, c.i, c.s, c.ln
        FROM csum c JOIN tot t ON t.doc_id = c.doc_id
        WHERE c.s * t.tl > t.ts * c.ln
    ),
    isl AS (
        SELECT doc_id, i, s,
               i - ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY i) AS sid
        FROM act
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(MIN(i) AS INTEGER) AS seg_start,
           CAST(MAX(i) AS INTEGER) AS seg_end,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(s) AS BIGINT) AS seg_sum
    FROM isl GROUP BY doc_id, sid
    """,
    doc="audio-style voice-activity segmentation: 32-byte chunks with "
        "integer energy sums (mapInPandas plumbing of a real frame/"
        "hop VAD), a chunk is active when its mean beats the "
        "document's mean (pure BIGINT cross-multiplication), and "
        "consecutive active chunks merge into segments via "
        "gaps-and-islands — the speech-segment extractor of an audio "
        "training-data pipeline, fully hash-checked",
)
def mm_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # The oracle enumerates chunk indexes 0..63 (<=2048 bytes) and
    # slices with substr (substr == bytes only for ASCII). Both are
    # properties of the CURRENT generator, not of this operator — so
    # enforce them in-plan: a longer or non-ASCII document raises
    # loudly here instead of silently diverging hash-red at the
    # driver. octet_length == length <=> every char is 1 UTF-8 byte.
    docs = docs.withColumn(
        "text",
        F.when(
            (F.octet_length("text") > 64 * 32)
            | (F.octet_length("text") != F.length("text")),
            F.raise_error(F.concat(
                F.lit("mm_audio_vad_segments oracle assumes ASCII "
                      "text <= 2048 bytes; violated by doc_id="),
                F.col("doc_id").cast("string"))),
        ).otherwise(F.col("text")))
    feats = mm.audio_chunk_features(mm.attach_binary_payload(docs),
                                    chunk_bytes=32)
    # energy = sum/len; energy * len recovers the integer byte sum but
    # can sit ulps below it when len isn't a power of two (the short
    # final chunk) — round, don't truncate (true value IS an integer)
    cs = feats.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("chunk_idx").cast("int").alias("i"),
        F.round(F.col("energy") * F.col("n_bytes"), 0).cast("bigint")
        .alias("s"),
        F.col("n_bytes").cast("bigint").alias("ln"))
    tot = cs.groupBy("doc_id").agg(F.sum("s").alias("ts"),
                                   F.sum("ln").alias("tl"))
    act = (cs.join(tot, "doc_id")
           .where(F.col("s") * F.col("tl") > F.col("ts") * F.col("ln")))
    w = Window.partitionBy("doc_id").orderBy("i")
    isl = act.withColumn("sid", F.col("i") - F.row_number().over(w))
    return (isl.groupBy("doc_id", "sid")
            .agg(F.min("i").cast("int").alias("seg_start"),
                 F.max("i").cast("int").alias("seg_end"),
                 F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
                 F.sum("s").cast("bigint").alias("seg_sum"))
            .drop("sid"))


# ---------------------------------------------------------------------------
# Cross-video duplicate-frame detection: two videos sharing sampled
# frame fingerprints are re-encodes / clips of the same content — the
# multimodal analog of near-dup text detection, and the dedup signal a
# video training corpus needs (frame-level, so partial overlap counts,
# unlike whole-payload digests). Pair generation happens ONLY inside
# per-fingerprint buckets, capped at _FRAME_BUCKET_CAP docs by
# doc_id rank (the LSH bucket discipline: a short payload shared by
# 10k videos costs cap^2 pairs, never 10k^2).
# ---------------------------------------------------------------------------

_FRAME_BUCKET_CAP = 64


@register(
    "mm_frame_dedup_crossvideo",
    oracle=f"""
    WITH params AS (
        SELECT doc_id, text AS b,
               CAST(CEIL(length(text) / 4.0) AS INTEGER) AS step
        FROM documents
    ),
    frames AS (
        SELECT doc_id, i AS frame_idx,
               sha256(substr(b, 1 + i * step, step)) AS fp,
               length(substr(b, 1 + i * step, step)) AS chunk_len
        FROM params CROSS JOIN (SELECT unnest(range(0, 4)) AS i) t
    ),
    f AS (
        SELECT DISTINCT doc_id, fp FROM frames WHERE chunk_len > 0
    ),
    capped AS (
        SELECT doc_id, fp FROM (
            SELECT doc_id, fp,
                   ROW_NUMBER() OVER (PARTITION BY fp
                                      ORDER BY doc_id) AS rn
            FROM f) t WHERE rn <= {_FRAME_BUCKET_CAP}
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_frames
    FROM capped a JOIN capped b
      ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
    doc="cross-video duplicate-frame pairs: videos sharing sampled "
        "frame sha256 fingerprints, with shared-frame counts — "
        "re-encode/clip detection at frame granularity. Pairs explode "
        f"only inside per-fingerprint buckets capped at "
        f"{_FRAME_BUCKET_CAP} docs (never corpus^2 under a payload "
        "flood); one shuffle on the fingerprint, one on the pair key.",
)
def mm_frame_dedup_crossvideo(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    frames = mm.frame_sample(mm.attach_binary_payload(docs), n_frames=4)
    f = (frames.select("doc_id", F.col("frame_sha256").alias("fp"))
         .distinct())
    wr = Window.partitionBy("fp").orderBy("doc_id")
    capped = (f.withColumn("rn", F.row_number().over(wr))
              .where(F.col("rn") <= _FRAME_BUCKET_CAP)
              .select("doc_id", "fp"))
    a = capped.select(F.col("doc_id").alias("id_a"), "fp")
    b = capped.select(F.col("doc_id").alias("id_b"), "fp")
    return (a.join(b, "fp")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).cast("bigint")
                 .alias("n_shared_frames")))


# ---------------------------------------------------------------------------
# Payload byte-entropy triage: collision rate of the byte histogram
# (Renyi-2 proxy — no libm log, so it hashes identically across
# engines) rolled up per source. Uniform random/compressed payloads
# sit near 3906 ppm (1/256); constant padding near 1e6 — the
# pre-decode filter that finds dead or double-compressed media before
# any codec time is spent.
# ---------------------------------------------------------------------------


@register(
    "mm_payload_entropy_report",
    oracle="""
    WITH d AS (
        -- empty/NULL payloads are out of scope EXPLICITLY on both
        -- sides (r11 review: the char unnest dropped them silently
        -- while the Spark side counted them at 0 ppm)
        SELECT doc_id, source, text FROM documents
        WHERE length(text) > 0
    ),
    ch AS (
        SELECT doc_id, source, substring(text, t.i, 1) AS c
        FROM d, unnest(generate_series(1, length(text))) AS t(i)
    ),
    cc AS (
        SELECT doc_id, source, c, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM ch GROUP BY doc_id, source, c
    ),
    per AS (
        SELECT doc_id, source,
               CAST(SUM(cnt * cnt) AS BIGINT) AS ss,
               CAST(SUM(cnt) AS BIGINT) AS n
        FROM cc GROUP BY doc_id, source
    ),
    ppm AS (
        SELECT source, ss * 1000000 // (n * n) AS collision_ppm
        FROM per
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_payloads,
           CAST(SUM(collision_ppm) // COUNT(*) AS BIGINT)
               AS mean_collision_ppm,
           CAST(MIN(collision_ppm) AS BIGINT) AS min_collision_ppm,
           CAST(MAX(collision_ppm) AS BIGINT) AS max_collision_ppm
    FROM ppm GROUP BY source
    """,
    doc="per-source byte-collision ('entropy') triage over binary "
        "payloads: floor-quantized ppm of the Renyi-2 collision rate "
        "sum(count_b^2)/len^2 per payload (numpy bincount over Arrow "
        "batches), min/mean/max per source — flags constant-padding "
        "and double-compressed media before decode; the oracle "
        "recomputes the histogram from per-char counts (payloads are "
        "guarded ASCII so chars == bytes)",
)
def mm_payload_entropy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # empty/NULL payloads are out of scope on BOTH sides (a collision
    # rate over zero bytes is undefined; the oracle's char unnest
    # would drop them silently — make the drop explicit instead, r11
    # review). The comparison also drops NULL text in both engines.
    docs = docs.where(F.octet_length("text") > 0)
    # the oracle counts CHARS; equality with byte counting holds only
    # for 1-byte chars — and the bigint ppm quantization needs
    # len^2 * 1e6 < 2^63. Both are generator properties, so enforce
    # them in-plan (the mm_audio_vad_segments discipline): violations
    # raise loudly instead of diverging hash-red at the driver.
    docs = docs.withColumn(
        "text",
        F.when(
            (F.octet_length("text") != F.length("text"))
            | (F.octet_length("text") > (1 << 20)),
            F.raise_error(F.concat(
                F.lit("mm_payload_entropy_report assumes ASCII text "
                      "<= 1 MiB; violated by doc_id="),
                F.col("doc_id").cast("string"))),
        ).otherwise(F.col("text")))
    feats = mm.byte_collision_features(mm.attach_binary_payload(docs))
    ppm = feats.select(
        "source",
        F.expr("sum_sq * 1000000 div (n_bytes * n_bytes)")
        .alias("collision_ppm"))
    return (ppm.groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_payloads"),
                 F.expr("sum(collision_ppm) div count(1)")
                 .cast("bigint").alias("mean_collision_ppm"),
                 F.min("collision_ppm").cast("bigint")
                 .alias("min_collision_ppm"),
                 F.max("collision_ppm").cast("bigint")
                 .alias("max_collision_ppm")))
