"""Training-data preparation operators: deterministic dataset
splitting, class balancing, TF-IDF term ranking, and a bucketed fuzzy
string join.  All JVM-side (no Python UDFs) and all hash-checked
against DuckDB.

Numeric-parity notes (the oracles hash bit-exact):
* splits use md5 hex prefixes compared lexicographically — identical in
  both engines, and stable under resharding/reordering at any scale
  (unlike `rand(seed)`, whose draw depends on partitioning);
* TF-IDF uses a *rational* idf `(N+1)/(df+1)` instead of `ln(...)` —
  IEEE multiply/divide are exactly rounded so both engines produce the
  same doubles, while `ln` may differ in the last ulp across libm
  implementations (JVM vs C).  Rankings are identical either way since
  x ↦ ln is monotone.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from iq_to_hdl_migration_spark.queries import register
from iq_to_hdl_migration_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# deterministic train/valid/test split (~80/10/10) by md5(doc_id) prefix.
# First 2 hex chars give 256 buckets: train < 'cc' (204), valid < 'e6'
# (26), test otherwise (26).

_SPLIT_SQL = """
CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
     WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'valid'
     ELSE 'test' END
"""


@register(
    "split_train_test",
    oracle=f"""
    SELECT {_SPLIT_SQL} AS split, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
    doc="content-addressed train/valid/test split — reproducible across "
        "engines, reshards, and reruns (rand(seed) is not); the per-split "
        "per-lang profile doubles as a split-skew audit",
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (F.when(bucket < "cc", "train")
             .when(bucket < "e6", "valid")
             .otherwise("test"))
    return (
        docs.select(split.alias("split"), "lang",
                    F.col("n_chars").cast("bigint").alias("nc"))
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("nc").alias("total_chars"))
    )


# ---------------------------------------------------------------------------
# inverse-frequency class weights (per-language balancing factors).

@register(
    "class_balance_weights",
    oracle="""
    WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
         t AS (SELECT CAST(SUM(n) AS DOUBLE) AS total,
                      CAST(COUNT(*) AS DOUBLE) AS k FROM c)
    SELECT c.lang, CAST(c.n AS BIGINT) AS n_docs,
           t.total / t.k / CAST(c.n AS DOUBLE) AS weight
    FROM c, t
    """,
    doc="inverse-frequency sampling weights for class-balanced training "
        "batches; the cross join against the 1-row total is broadcast",
)
def class_balance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    totals = counts.agg(
        F.sum("n_docs").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("k"))
    return (
        counts.crossJoin(F.broadcast(totals))
        .select("lang", "n_docs",
                (F.col("total") / F.col("k") / F.col("n_docs").cast("double"))
                .alias("weight"))
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms per source (rational idf; see module docstring).

_TOKS_SPARK = r"filter(split(lower(trim(text)), '\\s+'), t -> length(t) >= 3)"
_TOKS_DUCK = (r"list_filter(string_split_regex(lower(trim(text)), '\s+'),"
              r" t -> length(t) >= 3)")


@register(
    "text_tfidf_topk",
    oracle=f"""
    WITH n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    tok AS (
        SELECT doc_id, source, unnest({_TOKS_DUCK}) AS term FROM documents
    ),
    tf AS (SELECT source, term, CAST(COUNT(*) AS DOUBLE) AS tf
           FROM tok GROUP BY source, term),
    df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
           FROM tok GROUP BY term),
    scored AS (
        SELECT tf.source, tf.term,
               tf.tf * ((n.n_docs + 1) / (df.df + 1)) AS score
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT source, term, score FROM (
        SELECT source, term, score,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY score DESC, term) AS rn
        FROM scored
    ) WHERE rn <= 5
    """,
    doc="distributed TF-IDF: tokenize -> per-(source,term) tf -> "
        "per-term df -> join + window top-k; df side is re-used, both "
        "aggregations are partial-combine friendly",
    bench=True,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source",
        F.explode(F.expr(_TOKS_SPARK)).alias("term"))
    tf = tok.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf"))
    df = tok.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df"))
    n_docs = docs.count()  # scalar; folded into the score expression
    scored = tf.join(df, "term").select(
        "source", "term",
        (F.col("tf") * ((F.lit(float(n_docs)) + F.lit(1.0))
                        / (F.col("df") + F.lit(1.0)))).alias("score"))
    w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("source", "term", "score")
    )


# ---------------------------------------------------------------------------
# fuzzy string join over the DISTINCT value domain: the row-level table
# may repeat each name thousands of times (here: 20k parts / 64 names),
# so a key-level fuzzy join is inherently quadratic in group size.  The
# scalable shape is: aggregate to distinct values first (with group
# counts to map matches back), block by first token, levenshtein inside
# blocks.  Pair output is then quadratic only in |distinct values per
# block|, independent of row count.

@register(
    "fuzzy_name_pairs",
    oracle="""
    WITH p AS (
        SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY 1
    ),
    b AS (SELECT p_name, n, string_split(p_name, ' ')[1] AS blk FROM p)
    SELECT a.p_name AS name_a, c.p_name AS name_b,
           CAST(levenshtein(a.p_name, c.p_name) AS INTEGER) AS dist,
           a.n AS n_rows_a, c.n AS n_rows_b
    FROM b a JOIN b c
      ON a.blk = c.blk AND a.p_name < c.p_name
    WHERE levenshtein(a.p_name, c.p_name) <= 3
    """,
    doc="blocked fuzzy join on the distinct-name domain (first-token "
        "blocking, levenshtein <= 3 inside blocks) with group counts "
        "for mapping back to rows — never an all-pairs cross join, and "
        "pair count is independent of table row count",
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name").agg(F.count(F.lit(1)).alias("n"))
        .withColumn("blk", F.split(F.col("p_name"), " ").getItem(0))
    )
    a = names.alias("a")
    b = names.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.p_name") < F.col("b.p_name")))
        .select(F.col("a.p_name").alias("name_a"),
                F.col("b.p_name").alias("name_b"),
                F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
                .alias("dist"),
                F.col("a.n").alias("n_rows_a"),
                F.col("b.n").alias("n_rows_b"))
        .filter(F.col("dist") <= 3)
    )


# ---------------------------------------------------------------------------
# deterministic stratified sampling: ~10% per language by md5 prefix
# (content-addressed like split_train_test, so the sample is stable
# across engines, reshards, and reruns).

@register(
    "sample_stratified_docs",
    oracle="""
    SELECT lang,
           CAST(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                              < '1a' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sampled,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM documents GROUP BY lang
    """,
    doc="deterministic ~10% stratified sample per language (md5 bucket "
        "< 0x1a = 26/256); content-addressed sampling is reproducible "
        "and shuffle-free, unlike rand(seed) or sampleBy",
)
def sample_stratified_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    in_sample = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "1a",
        1).otherwise(0)
    return (
        docs.groupBy("lang")
        .agg(F.sum(in_sample).cast("bigint").alias("n_sampled"),
             F.count(F.lit(1)).alias("n_total"))
    )


# ---------------------------------------------------------------------------
# Sequence-packing plan (concat-and-chunk): documents are concatenated
# in (source, doc_id) order and cut into fixed max_seq_len chunks — the
# GPT-style packing every pretraining dataloader performs. The per-doc
# chunk assignment is a pure prefix sum (one window per source), so the
# whole plan is exact integer arithmetic: no greedy bin state, no
# driver loop, and the parallel unit is the source shard — exactly how
# a 100 TB corpus is packed in practice (per-shard sequential order).
# ---------------------------------------------------------------------------

_PACK_MAX_LEN = 512


@register(
    "mlprep_sequence_packing",
    bench=True,
    oracle=f"""
    WITH tok AS (
        SELECT source, doc_id,
               -- plain whitespace tokens (NOT the module's len>=3
               -- TF-IDF filter: packing budgets every token)
               len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tok
        FROM documents
    ),
    cum AS (
        SELECT source, doc_id, n_tok,
               SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum_incl
        FROM tok
    ),
    marked AS (
        SELECT source, n_tok, cum_incl,
               (cum_incl - n_tok) // {_PACK_MAX_LEN} AS chunk_start,
               (cum_incl - 1) // {_PACK_MAX_LEN} AS chunk_end
        FROM cum
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST((SUM(n_tok) + {_PACK_MAX_LEN} - 1) // {_PACK_MAX_LEN}
                AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN chunk_start != chunk_end THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boundary_spanning_docs,
           CAST(SUM(n_tok) AS DOUBLE)
               / CAST(((SUM(n_tok) + {_PACK_MAX_LEN} - 1)
                       // {_PACK_MAX_LEN}) * {_PACK_MAX_LEN} AS DOUBLE)
               AS packing_efficiency
    FROM marked GROUP BY source
    """,
    doc="concat-and-chunk sequence packing plan at max_seq_len=512: "
        "per-source chunk count, boundary-spanning docs, and packing "
        "efficiency via an exact integer prefix sum — one window per "
        "source shard, one aggregate shuffle",
)
def mlprep_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _PACK_MAX_LEN
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", "doc_id",
        # plain whitespace tokens (not the module's len>=3 TF-IDF
        # filter: packing budgets every token)
        F.size(F.expr(r"split(lower(trim(text)), '\\s+')"))
        .cast("bigint").alias("n_tok"))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    marked = (tok.withColumn("cum_incl", F.sum("n_tok").over(w))
              .withColumn("chunk_start",
                          F.expr(f"(cum_incl - n_tok) div {m}"))
              .withColumn("chunk_end", F.expr(f"(cum_incl - 1) div {m}")))
    return (marked.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").alias("total_tokens"),
                 F.sum(F.when(F.col("chunk_start") != F.col("chunk_end"),
                              1).otherwise(0))
                 .alias("n_boundary_spanning_docs"))
            .select("source",
                    "n_docs",
                    "total_tokens",
                    F.expr(f"(total_tokens + {m} - 1) div {m}")
                    .alias("n_chunks"),
                    "n_boundary_spanning_docs",
                    (F.col("total_tokens").cast("double")
                     / (F.expr(f"(total_tokens + {m} - 1) div {m}")
                        * m).cast("double"))
                    .alias("packing_efficiency")))


# ---------------------------------------------------------------------------
# temperature-scaled source mixing (the multinomial-sampling weights every
# multi-source pretraining run needs: raw proportional sampling lets the
# biggest crawl drown curated sources; tau < 1 flattens the mixture).
#
# tau = 0.5 deliberately: w_i = sqrt(n_i) / sum_j sqrt(n_j), and IEEE-754
# sqrt is exactly rounded in both engines (JVM Math.sqrt and C libm), so
# the per-source numerators are bit-identical.  The denominator would
# still be order-dependent as a double sum, so each sqrt is floor-snapped
# to integer micro-units first and summed EXACTLY as BIGINT — the same
# fixed-point trick as the int8 quantization audit.  Every remaining op
# is a single exactly-rounded double op with a parenthesized evaluation
# order, so the oracle hash-matches bit-for-bit.
# ---------------------------------------------------------------------------

@register(
    "mix_temperature_sampling",
    oracle=r"""
    WITH tok AS (
        SELECT source,
               len(string_split_regex(lower(trim(text)), '\s+')) AS nt
        FROM documents
    ),
    c AS (
        SELECT source, CAST(SUM(nt) AS BIGINT) AS n_tokens
        FROM tok GROUP BY source
    ),
    s AS (
        SELECT source, n_tokens,
               CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0)
                    AS BIGINT) AS sq
        FROM c
    ),
    t AS (
        SELECT CAST(SUM(sq) AS BIGINT) AS tot_sq,
               CAST(SUM(n_tokens) AS BIGINT) // 2 AS budget
        FROM s
    )
    SELECT s.source, s.n_tokens,
           CAST(s.sq AS DOUBLE) / CAST(t.tot_sq AS DOUBLE) AS weight,
           CAST(FLOOR((CAST(t.budget AS DOUBLE) * CAST(s.sq AS DOUBLE))
                      / CAST(t.tot_sq AS DOUBLE)) AS BIGINT) AS alloc_tokens,
           CAST(FLOOR((CAST(t.budget AS DOUBLE) * CAST(s.sq AS DOUBLE))
                      / CAST(t.tot_sq AS DOUBLE)) AS DOUBLE)
               / CAST(s.n_tokens AS DOUBLE) AS epochs
    FROM s, t
    """,
    doc="temperature-scaled (tau=0.5) multi-source sampling weights and "
        "token allocation under a half-corpus budget; per-source epochs "
        "expose up-sampling pressure. Fixed-point sqrt accumulation makes "
        "the mixture bit-exact across engines. One scan + one tiny "
        "broadcast of the 1-row total.",
)
def mix_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = (docs.select(
            "source",
            F.size(F.expr(r"split(lower(trim(text)), '\\s+')"))
            .cast("bigint").alias("nt"))
         .groupBy("source")
         .agg(F.sum("nt").alias("n_tokens")))
    s = c.withColumn(
        "sq",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000000.0)
        .cast("bigint"))
    t = s.agg(F.sum("sq").cast("bigint").alias("tot_sq"),
              F.expr("sum(n_tokens) div 2").cast("bigint").alias("budget"))
    alloc = F.floor(
        (F.col("budget").cast("double") * F.col("sq").cast("double"))
        / F.col("tot_sq").cast("double")).cast("bigint")
    return (s.join(F.broadcast(t))
            .select("source", "n_tokens",
                    (F.col("sq").cast("double")
                     / F.col("tot_sq").cast("double")).alias("weight"),
                    alloc.alias("alloc_tokens"),
                    (alloc.cast("double")
                     / F.col("n_tokens").cast("double")).alias("epochs")))


# ---------------------------------------------------------------------------
# applying the temperature mixture: deterministic content-addressed
# downsampling. Sources whose epoch share is < 1 keep only documents
# whose 16-bit md5(doc_id) bucket falls under floor(epochs * 65536) —
# the same hash-split discipline as split_train_test, so the sampled
# corpus is identical on every engine, reshard, and rerun (rand() is
# none of those). Upsampled sources (epochs >= 1) keep everything; the
# repeat factor is the planner's job (mix_temperature_sampling.epochs),
# not the sampler's.
# ---------------------------------------------------------------------------

_MIX_DUCK_CTES = r"""
    tok AS (
        SELECT source, doc_id,
               len(string_split_regex(lower(trim(text)), '\s+')) AS nt
        FROM documents
    ),
    c AS (
        SELECT source, CAST(SUM(nt) AS BIGINT) AS n_tokens
        FROM tok GROUP BY source
    ),
    s AS (
        SELECT source, n_tokens,
               CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0)
                    AS BIGINT) AS sq
        FROM c
    ),
    t AS (
        SELECT CAST(SUM(sq) AS BIGINT) AS tot_sq,
               CAST(SUM(n_tokens) AS BIGINT) // 2 AS budget
        FROM s
    )
"""


@register(
    "mix_apply_downsample",
    oracle=f"""
    WITH {_MIX_DUCK_CTES},
    r AS (
        SELECT s.source, s.n_tokens,
               CAST(FLOOR((CAST(t.budget AS DOUBLE) * CAST(s.sq AS DOUBLE))
                          / CAST(t.tot_sq AS DOUBLE)) AS DOUBLE)
                   / CAST(s.n_tokens AS DOUBLE) AS epochs
        FROM s, t
    ),
    thr AS (
        SELECT source, n_tokens, epochs,
               CASE WHEN epochs >= 1.0 THEN 65536
                    ELSE CAST(FLOOR(epochs * 65536.0) AS BIGINT)
               END AS thr16
        FROM r
    ),
    kept AS (
        SELECT tok.source, tok.nt
        FROM tok JOIN thr ON tok.source = thr.source
        WHERE CAST('0x' || substr(md5(CAST(tok.doc_id AS VARCHAR)), 1, 4)
                   AS BIGINT) < thr.thr16
    ),
    kept_agg AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
               CAST(SUM(nt) AS BIGINT) AS n_tokens_kept
        FROM kept GROUP BY source
    )
    SELECT thr.source, thr.n_tokens, thr.epochs,
           COALESCE(k.n_docs_kept, 0) AS n_docs_kept,
           COALESCE(k.n_tokens_kept, 0) AS n_tokens_kept,
           CAST(COALESCE(k.n_tokens_kept, 0) AS DOUBLE)
               / CAST(thr.n_tokens AS DOUBLE) AS achieved_rate
    FROM thr LEFT JOIN kept_agg k ON thr.source = k.source
    """,
    doc="deterministic application of the tau=0.5 mixture: md5-bucket "
        "downsampling to each source's epoch share (upsampled sources "
        "pass through), reporting target vs achieved token rates; "
        "content-addressed like split_train_test so the sample is "
        "stable under resharding. One scan + broadcast thresholds.",
)
def mix_apply_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", "doc_id",
        F.size(F.expr(r"split(lower(trim(text)), '\\s+')"))
        .cast("bigint").alias("nt"))
    c = tok.groupBy("source").agg(F.sum("nt").alias("n_tokens"))
    s = c.withColumn(
        "sq",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000000.0)
        .cast("bigint"))
    t = s.agg(F.sum("sq").cast("bigint").alias("tot_sq"),
              F.expr("sum(n_tokens) div 2").cast("bigint").alias("budget"))
    epochs = (F.floor(
        (F.col("budget").cast("double") * F.col("sq").cast("double"))
        / F.col("tot_sq").cast("double")).cast("double")
        / F.col("n_tokens").cast("double"))
    thr = (s.join(F.broadcast(t))
           .select("source", "n_tokens", epochs.alias("epochs"))
           .withColumn("thr16",
                       F.when(F.col("epochs") >= 1.0, F.lit(65536).cast("bigint"))
                       .otherwise(F.floor(F.col("epochs") * 65536.0)
                                  .cast("bigint"))))
    bucket16 = F.expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10)"
        " AS BIGINT)")
    kept = (tok.join(F.broadcast(thr.select("source", "thr16")), "source")
            .where(bucket16 < F.col("thr16")))
    kept_agg = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("nt").alias("n_tokens_kept"))
    # both sides are per-source aggregates (bounded by source count);
    # broadcast the kept side so the report join never shuffles
    return (thr.join(F.broadcast(kept_agg), "source", "left")
            .select("source", "n_tokens", "epochs",
                    F.coalesce("n_docs_kept", F.lit(0)).alias("n_docs_kept"),
                    F.coalesce("n_tokens_kept", F.lit(0))
                    .alias("n_tokens_kept"),
                    (F.coalesce("n_tokens_kept", F.lit(0)).cast("double")
                     / F.col("n_tokens").cast("double"))
                    .alias("achieved_rate")))


# ---------------------------------------------------------------------------
# exact sequence-length percentiles per source — the report that picks
# the packing max_len (mlprep_sequence_packing) and the truncation
# budget. Percentile ranks are computed with INTEGER arithmetic
# (ceil(q*n) = (q_num*n + q_num) // q_den) so band edges are
# bit-identical in both engines — no float quantile interpolation, no
# sketch. One shuffle on source; the rank window is per-source.
# ---------------------------------------------------------------------------

@register(
    "mlprep_seqlen_percentiles",
    oracle=r"""
    WITH tok AS (
        SELECT source, doc_id,
               CAST(len(string_split_regex(lower(trim(text)), '\s+'))
                    AS BIGINT) AS nt
        FROM documents
    ),
    ranked AS (
        SELECT source, nt,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY nt, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM tok
    )
    SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN nt END) AS p50_tokens,
           MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN nt END) AS p90_tokens,
           MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN nt END)
               AS p99_tokens,
           MAX(nt) AS max_tokens
    FROM ranked GROUP BY source
    """,
    doc="exact per-source token-count percentiles (p50/p90/p99/max) via "
        "integer rank arithmetic — the packing/truncation sizing report; "
        "deterministic across engines (no float quantile interpolation)",
)
def mlprep_seqlen_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", "doc_id",
        F.size(F.expr(r"split(lower(trim(text)), '\\s+')"))
        .cast("bigint").alias("nt"))
    w = Window.partitionBy("source").orderBy("nt", "doc_id")
    wn = Window.partitionBy("source")
    ranked = (tok.withColumn("rn", F.row_number().over(w))
              .withColumn("n", F.count(F.lit(1)).over(wn)))
    pick = lambda num, den: F.max(
        F.when(F.col("rn") == F.expr(f"({num} * n + {num}) div {den}"),
               F.col("nt")))
    return (ranked.groupBy("source")
            .agg(F.max("n").cast("bigint").alias("n_docs"),
                 F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"),
                              F.col("nt"))).alias("p50_tokens"),
                 pick(9, 10).alias("p90_tokens"),
                 pick(99, 100).alias("p99_tokens"),
                 F.max("nt").alias("max_tokens")))


# ---------------------------------------------------------------------------
# the packing plan's operational output: the (doc -> chunk, offset) map
# a dataloader actually consumes. mlprep_sequence_packing above reports
# the per-source summary; this emits one row per document with its
# chunk id and intra-chunk offset under the same concat-and-chunk rule
# (deterministic doc_id order, per-source prefix sum, max_len = 512).
# ---------------------------------------------------------------------------

@register(
    "mlprep_packing_assignments",
    oracle=f"""
    WITH tok AS (
        SELECT source, doc_id,
               CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
                    AS BIGINT) AS n_tok
        FROM documents
    ),
    marked AS (
        SELECT source, doc_id, n_tok,
               SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum_incl
        FROM tok
    )
    SELECT source, doc_id, n_tok,
           CAST((cum_incl - n_tok) // {_PACK_MAX_LEN} AS BIGINT) AS chunk_id,
           CAST((cum_incl - n_tok) % {_PACK_MAX_LEN} AS BIGINT)
               AS offset_in_chunk,
           CASE WHEN (cum_incl - n_tok) // {_PACK_MAX_LEN}
                     != (cum_incl - 1) // {_PACK_MAX_LEN}
                THEN 1 ELSE 0 END AS spans_boundary
    FROM marked
    """,
    doc="per-document packing assignment (chunk id, intra-chunk offset, "
        "boundary-span flag) under the concat-and-chunk rule — the "
        "operational map a dataloader consumes; exact integer prefix "
        "sums, per-source window partitioning",
)
def mlprep_packing_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _PACK_MAX_LEN
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", "doc_id",
        F.size(F.expr(r"split(lower(trim(text)), '\\s+')"))
        .cast("bigint").alias("n_tok"))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    marked = tok.withColumn("cum_incl", F.sum("n_tok").over(w))
    start = F.col("cum_incl") - F.col("n_tok")
    return marked.select(
        "source", "doc_id", "n_tok",
        F.expr(f"(cum_incl - n_tok) div {m}").alias("chunk_id"),
        (start % m).alias("offset_in_chunk"),
        F.when(F.expr(f"(cum_incl - n_tok) div {m}")
               != F.expr(f"(cum_incl - 1) div {m}"), 1)
        .otherwise(0).alias("spans_boundary"))


# ---------------------------------------------------------------------------
# weighted priority sampling (Duffield/Lund/Thorup): each item gets
# priority = u / w with u a content-addressed uniform from md5 — the
# k smallest priorities form a weighted sample WITHOUT replacement
# whose inclusion probability tracks item weight. u is a 48-bit md5
# prefix (exact as a double), so priority is ONE exactly-rounded
# division — deterministic across engines, reshards and reruns, unlike
# rand()-based samplers. Weight = document length in chars (sample
# long docs preferentially for inspection).
# ---------------------------------------------------------------------------

@register(
    "sample_weighted_priority",
    oracle="""
    WITH p AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
               CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                         AS BIGINT) AS DOUBLE)
                   / CAST(n_chars AS DOUBLE) AS priority
        FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, source, n_chars, priority FROM (
        SELECT doc_id, source, n_chars, priority,
               ROW_NUMBER() OVER (ORDER BY priority, doc_id) AS rn
        FROM p
    ) t WHERE rn <= 100
    """,
    doc="weighted priority sample (k=100, weight = n_chars): k smallest "
        "u/w priorities with a content-addressed md5 uniform — "
        "deterministic weighted sampling without replacement; one scan "
        "+ a top-k (no global sort materialization at scale: TakeOrdered)",
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = F.expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 12),"
               " 16, 10) AS BIGINT)").cast("double")
    p = docs.select("doc_id", "source",
                    F.col("n_chars").cast("bigint").alias("n_chars"),
                    (u / F.col("n_chars").cast("double")).alias("priority"))
    # orderBy + limit compiles to TakeOrderedAndProject — per-partition
    # top-k then a k-row merge, never a single-partition global window
    return (p.orderBy("priority", "doc_id").limit(100)
            .select("doc_id", "source", "n_chars", "priority"))


# ---------------------------------------------------------------------------
# Entity resolution end-to-end: the fuzzy blocking join above feeds
# connected components (operators/components.py: iterative min-label
# propagation, each round one join + groupBy on vertex id), and each
# component becomes one resolved entity with a canonical name (the
# lexicographic minimum — deterministic), its member list, and the
# total row mass it maps back to.  At 100 TB the quadratic step stays
# confined to |distinct names per block|; components iterate on the
# (much smaller) matched-name graph only.  Oracle: DuckDB recursive
# CTE computing reachability-min labels — an independent formulation
# of the same clustering.

@register(
    "entity_resolution_clusters",
    oracle="""
    WITH RECURSIVE p AS (
        SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY 1
    ),
    b AS (SELECT p_name, n, string_split(p_name, ' ')[1] AS blk FROM p),
    e0 AS (
        SELECT a.p_name AS u, c.p_name AS v
        FROM b a JOIN b c
          ON a.blk = c.blk AND a.p_name < c.p_name
        WHERE levenshtein(a.p_name, c.p_name) <= 3
    ),
    e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
    nodes AS (SELECT DISTINCT u AS name FROM e),
    reach(name, other) AS (
        SELECT name, name FROM nodes
        UNION
        SELECT r.name, e.v FROM reach r JOIN e ON e.u = r.other
    ),
    comp AS (
        SELECT name, MIN(other) AS canonical FROM reach GROUP BY name
    )
    SELECT comp.canonical AS canonical_name,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(p.n) AS BIGINT) AS n_rows_total,
           string_agg(comp.name, '|' ORDER BY comp.name) AS member_names
    FROM comp JOIN p ON p.p_name = comp.name
    GROUP BY comp.canonical
    """,
    doc="entity resolution: blocked levenshtein matching -> iterative "
        "min-label connected components -> one row per resolved "
        "entity (canonical = lexicographic min, member list, mapped "
        "row mass); oracle is a DuckDB recursive-CTE reachability-min "
        "clustering — an independent formulation",
)
def entity_resolution_clusters(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from iq_to_hdl_migration_spark.operators.components import (
        connected_components)

    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name").agg(F.count(F.lit(1)).alias("n"))
        .withColumn("blk", F.split(F.col("p_name"), " ").getItem(0)))
    a, b = names.alias("a"), names.alias("b")
    edges = (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.p_name") < F.col("b.p_name")))
        .where(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 3)
        .select(F.col("a.p_name").alias("id_a"),
                F.col("b.p_name").alias("id_b")))
    comp = connected_components(edges)
    return (comp.join(names.select(F.col("p_name").alias("id"), "n"), "id")
            .groupBy(F.col("component").alias("canonical_name"))
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.sum("n").cast("bigint").alias("n_rows_total"),
                 F.array_join(F.array_sort(F.collect_list("id")), "|")
                 .alias("member_names")))


# ---------------------------------------------------------------------------
# Document chunking for training windows: fixed token windows with
# overlap (W=32, stride 24 -> 25% overlap), each chunk carrying a
# portable md5-prefix fingerprint so downstream chunk-level dedup /
# contamination checks need no re-tokenization.  Pure JVM expressions
# (split -> sequence -> explode -> slice) — no Python in the path, no
# shuffle at all until whatever consumes the chunks; at 100 TB this
# is a map-only stage that scales with input bytes.

_CHUNK_W = 32
_CHUNK_S = 24


@register(
    "mlprep_doc_chunks",
    bench=True,
    oracle=rf"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents
    ),
    c AS (
        SELECT doc_id, toks, len(toks) AS n,
               unnest(generate_series(0, len(toks) - 1, {_CHUNK_S})) AS s
        FROM t
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(s // {_CHUNK_S} AS BIGINT) AS chunk_idx,
           CAST(s AS BIGINT) AS start_token,
           CAST(least({_CHUNK_W}, n - s) AS BIGINT) AS n_chunk_tokens,
           CAST('0x' || substr(md5(array_to_string(
                    list_slice(toks, s + 1, s + {_CHUNK_W}), ' ')), 1, 15)
                AS BIGINT) AS chunk_fp
    FROM c
    """,
    doc="overlapping token-window chunker (W=32, stride 24) with a "
        "portable md5-prefix fingerprint per chunk — the training-"
        "window prep stage as a map-only JVM pipeline (split, "
        "sequence, explode, slice); fingerprints value-hash-checked",
)
def mlprep_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = docs.select(
        "doc_id",
        F.expr(r"split(lower(trim(text)), '\\s+')").alias("toks"))
    c = t.select(
        "doc_id", "toks", F.size("toks").alias("n"),
        F.explode(F.expr(
            f"sequence(0, size(toks) - 1, {_CHUNK_S})")).alias("s"))
    return c.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.expr(f"CAST(s div {_CHUNK_S} AS BIGINT)").alias("chunk_idx"),
        F.col("s").cast("bigint").alias("start_token"),
        F.least(F.lit(_CHUNK_W), F.col("n") - F.col("s"))
        .cast("bigint").alias("n_chunk_tokens"),
        F.expr(f"CAST(conv(substr(md5(array_join(slice(toks, s + 1, "
               f"{_CHUNK_W}), ' ')), 1, 15), 16, 10) AS BIGINT)")
        .alias("chunk_fp"))


@register(
    "mlprep_chunk_dedup_stats",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents
    ),
    c AS (
        SELECT doc_id, toks, len(toks) AS n,
               unnest(generate_series(0, len(toks) - 1, {_CHUNK_S})) AS s
        FROM t
    ),
    f AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST('0x' || substr(md5(array_to_string(
                        list_slice(toks, s + 1, s + {_CHUNK_W}), ' ')),
                    1, 15) AS BIGINT) AS chunk_fp
        FROM c
    )
    SELECT chunk_fp,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM f GROUP BY chunk_fp HAVING COUNT(*) > 1
    """,
    doc="chunk-level exact dedup over the chunker's fingerprints: "
        "repeated 32-token windows (cross-document boilerplate) with "
        "occurrence/document counts — one groupBy on a 60-bit "
        "fingerprint, the map-side-combinable consumer of "
        "mlprep_doc_chunks",
    bench=True,
)
def mlprep_chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = mlprep_doc_chunks(spark, sf_dir)
    return (chunks.groupBy("chunk_fp")
            .agg(F.count(F.lit(1)).alias("n_occurrences"),
                 F.countDistinct("doc_id").alias("n_docs"),
                 F.min("doc_id").alias("first_doc"))
            .where(F.col("n_occurrences") > 1))


# ---------------------------------------------------------------------------
# Consistent bottom-k sampling: per group keep the k documents with the
# smallest content hash.  Unlike Bernoulli sampling (sample_stratified_
# docs) the sample size is EXACT, and unlike random sampling the
# result is consistent across engines, reruns, and reshards — and
# mergeable: bottom-k of a union is bottom-k of the per-partition
# bottom-ks, so at 100 TB each partition contributes at most k rows to
# a tiny shuffle.  The same primitive underlies the KMV sketch above;
# here it is exposed as the sampling operator a curation pipeline uses
# for eval slices and human review queues.

_BK_K = 5


@register(
    "sample_bottomk_per_lang",
    oracle=f"""
    SELECT lang, CAST(doc_id AS BIGINT) AS doc_id,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                AS BIGINT) AS hv
    FROM documents
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY lang
        ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                      AS BIGINT), doc_id) <= {_BK_K}
    """,
    doc="consistent bottom-k sample (k=5 per language) by content "
        "hash: exact-size, engine/reshard-stable, and mergeable "
        "(bottom-k of per-partition bottom-ks) — the deterministic "
        "eval-slice sampler; WindowGroupLimit keeps per-group state "
        "at k rows",
)
def sample_bottomk_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.col("doc_id").cast("bigint").alias("doc_id"),
        F.expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), "
               "16, 10) AS BIGINT)").alias("hv"))
    w = Window.partitionBy("lang").orderBy("hv", "doc_id")
    return (docs.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= _BK_K).drop("_rn"))


@register(
    "mlprep_length_bucket_padding_waste",
    oracle="""
    WITH tok AS (
        SELECT CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
                    AS BIGINT) AS nt
        FROM documents
    ),
    bucketed AS (
        SELECT nt, ((nt + 63) // 64) * 64 AS bucket_len FROM tok
    ),
    per_bucket AS (
        SELECT bucket_len,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(nt) AS BIGINT) AS sum_tokens
        FROM bucketed GROUP BY bucket_len
    )
    SELECT CAST(bucket_len AS BIGINT) AS bucket_len, n_docs, sum_tokens,
           CAST(n_docs * bucket_len AS BIGINT) AS padded_tokens,
           CAST(n_docs * bucket_len - sum_tokens AS BIGINT)
               AS wasted_tokens,
           CAST(n_docs * bucket_len - sum_tokens AS DOUBLE)
               / CAST(n_docs * bucket_len AS DOUBLE) AS waste_rate
    FROM per_bucket
    """,
    doc="inference-batching padding audit: docs bucketed to the next "
        "64-token boundary (the fixed-shape batching a serving stack "
        "pads to); per bucket the real vs padded token mass and the "
        "waste rate — the evidence for choosing bucket boundaries. "
        "Pure BIGINT until one final double division; single groupBy "
        "on a bounded bucket key (max_seqlen/64 buckets at any scale).",
)
def mlprep_length_bucket_padding_waste(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nt = docs.select(
        F.size(F.expr(r"split(lower(trim(text)), '\\s+')"))
        .cast("bigint").alias("nt"))
    per_bucket = (nt.withColumn("bucket_len",
                                F.expr("((nt + 63) div 64) * 64"))
                  .groupBy("bucket_len")
                  .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                       F.sum("nt").cast("bigint").alias("sum_tokens")))
    padded = (F.col("n_docs") * F.col("bucket_len")).cast("bigint")
    return per_bucket.select(
        F.col("bucket_len").cast("bigint").alias("bucket_len"),
        "n_docs", "sum_tokens",
        padded.alias("padded_tokens"),
        (padded - F.col("sum_tokens")).cast("bigint")
        .alias("wasted_tokens"),
        ((padded - F.col("sum_tokens")).cast("double")
         / padded.cast("double")).alias("waste_rate"))


# ---------------------------------------------------------------------------
# Curriculum ordering (Bengio et al. 2009, public): schedule training
# easy -> hard (difficulty = token count) while interleaving sources
# inside each difficulty band so no band is a single-source run.
# Scale shape: difficulty deciles come from ONE exact-percentile
# aggregate (9 boundary values, broadcast) — NOT a global row_number,
# which would single-partition the corpus sort; the only windows are
# partitioned by (decile, source) and (decile), both distributed. The
# curriculum order is the sort key (decile, wave, source, doc_id) —
# at scale the writer emits it as a range-partitioned sorted write,
# which Spark distributes, rather than materializing one global
# position integer.
# ---------------------------------------------------------------------------


@register(
    "mlprep_curriculum_interleave",
    oracle="""
    WITH nt AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
                    AS BIGINT) AS n_tokens
        FROM documents
    ),
    bounds AS (
        SELECT quantile_cont(n_tokens,
                             [0.1, 0.2, 0.3, 0.4, 0.5,
                              0.6, 0.7, 0.8, 0.9]) AS bs
        FROM nt
    ),
    dec AS (
        SELECT n.doc_id, n.source, n.n_tokens,
               CAST(len(list_filter(b.bs, x -> x <= n.n_tokens))
                    AS INTEGER) AS decile
        FROM nt n, bounds b
    ),
    waved AS (
        SELECT doc_id, source, n_tokens, decile,
               CAST(ROW_NUMBER() OVER (PARTITION BY decile, source
                                       ORDER BY n_tokens, doc_id)
                    AS BIGINT) AS wave
        FROM dec
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source, n_tokens,
           decile, wave
    FROM waved
    """,
    doc="curriculum schedule: difficulty deciles from one exact-"
        "percentile aggregate (9 broadcast boundaries, never a global "
        "sort window), then a per-(decile, source) wave counter so "
        "consuming the sort key (decile, wave, source, doc_id) trains "
        "easy->hard with sources round-robined inside each band; all "
        "integer outputs",
)
def mlprep_curriculum_interleave(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nt = docs.select(
        "doc_id", "source",
        F.size(F.expr(r"split(lower(trim(text)), '\\s+')"))
        .cast("bigint").alias("n_tokens"))
    bounds = nt.agg(F.expr(
        "percentile(n_tokens, array(0.1D, 0.2D, 0.3D, 0.4D, 0.5D, "
        "0.6D, 0.7D, 0.8D, 0.9D))").alias("bs"))
    dec = (nt.join(F.broadcast(bounds))
           .withColumn(
               "decile",
               F.expr("CAST(size(filter(bs, x -> x <= CAST(n_tokens "
                      "AS DOUBLE))) AS INT)"))
           .drop("bs"))
    wv = Window.partitionBy("decile", "source").orderBy("n_tokens",
                                                        "doc_id")
    return dec.select("doc_id", "source", "n_tokens", "decile",
                      F.row_number().over(wv).cast("bigint").alias("wave"))


# ---------------------------------------------------------------------------
# Token-budget corpus selection: pick the highest-quality-density
# documents (distinct-token ratio per token — a vocabulary-richness
# proxy) until a token budget (25% of the corpus) is spent. The naive
# plan is a global sort + running sum — one partition at 100 TB. This
# is the 2-pass binned variant (the conversion-latency discipline):
# pass 1 bins docs by a 2^20-quantized density key and cumulates the
# BOUNDED bin table (<= 2^20 rows) to find the boundary bin; pass 2
# selects whole bins above the boundary and finishes the partial bin
# with a window restricted to THAT bin only. Deterministic: integer
# bins, integer token counts, doc_id tie-break inside the boundary bin.
# ---------------------------------------------------------------------------

_TBS_PCT = 25  # select until 25% of corpus tokens are spent


@register(
    "mlprep_token_budget_selection",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
                    AS BIGINT) AS nt,
               CAST(len(list_distinct(string_split_regex(
                        lower(trim(text)), '\\s+'))) AS BIGINT) AS nd
        FROM documents
    ),
    keyed AS (
        SELECT doc_id, source, nt, nd,
               CAST(FLOOR(CAST(nd AS DOUBLE) / CAST(nt AS DOUBLE)
                          * 1048576.0) AS BIGINT) AS qd
        FROM d WHERE nt > 0
    ),
    budget AS (
        SELECT CAST(SUM(nt) AS BIGINT) * {_TBS_PCT} // 100 AS b FROM keyed
    ),
    bins AS (
        SELECT qd, CAST(SUM(nt) AS BIGINT) AS bin_nt FROM keyed GROUP BY qd
    ),
    cum AS (
        SELECT qd, bin_nt,
               CAST(COALESCE(SUM(bin_nt) OVER (
                   ORDER BY qd DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS above_nt
        FROM bins
    ),
    marked AS (
        SELECT c.qd, c.above_nt,
               (c.above_nt + c.bin_nt <= b.b) AS whole,
               (c.above_nt < b.b AND c.above_nt + c.bin_nt > b.b)
                   AS boundary
        FROM cum c, budget b
    ),
    sel AS (
        SELECT k.doc_id, k.source, k.nt, k.nd,
               m.whole, m.boundary, m.above_nt, b.b,
               CAST(SUM(k.nt) OVER (PARTITION BY k.qd
                                    ORDER BY k.doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS BIGINT) AS run_nt
        FROM keyed k JOIN marked m USING (qd), budget b
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source, nt, nd,
           CAST(nd AS DOUBLE) / CAST(nt AS DOUBLE) AS density
    FROM sel
    WHERE whole OR (boundary AND above_nt + run_nt <= b)
    """,
    doc="token-budget corpus selection: greedy by quality density "
        "(distinct-token ratio) until 25% of corpus tokens are spent "
        "— 2-pass binned (2^20 integer density bins; the cumulative "
        "runs over the bounded bin table, whole bins selected above "
        "the boundary, one windowed prefix sum INSIDE the boundary "
        "bin only) so no global single-partition sort exists at any "
        "corpus size",
    bench=True,
)
def mlprep_token_budget_selection(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = r"split(lower(trim(text)), '\\s+')"
    d = docs.select(
        "doc_id", "source",
        F.size(F.expr(toks)).cast("bigint").alias("nt"),
        F.size(F.array_distinct(F.expr(toks))).cast("bigint").alias("nd"))
    keyed = (d.where(F.col("nt") > 0)
             .withColumn("qd", F.floor(F.col("nd").cast("double")
                                       / F.col("nt").cast("double")
                                       * F.lit(1048576.0)).cast("bigint")))
    budget = keyed.agg(F.expr(
        f"(CAST(sum(nt) AS BIGINT) * {_TBS_PCT}) div 100").alias("b"))
    bins = keyed.groupBy("qd").agg(F.sum("nt").cast("bigint")
                                   .alias("bin_nt"))
    wcum = (Window.orderBy(F.desc("qd"))
            .rowsBetween(Window.unboundedPreceding, -1))
    cum = bins.withColumn(
        "above_nt", F.coalesce(F.sum("bin_nt").over(wcum), F.lit(0))
        .cast("bigint"))
    marked = (cum.join(F.broadcast(budget))
              .select("qd", "above_nt",
                      (F.col("above_nt") + F.col("bin_nt") <= F.col("b"))
                      .alias("whole"),
                      ((F.col("above_nt") < F.col("b"))
                       & (F.col("above_nt") + F.col("bin_nt")
                          > F.col("b"))).alias("boundary")))
    wpart = (Window.partitionBy("qd").orderBy("doc_id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (keyed.join(marked, "qd").join(F.broadcast(budget))
            .withColumn("run_nt", F.sum("nt").over(wpart).cast("bigint"))
            .where(F.col("whole")
                   | (F.col("boundary")
                      & (F.col("above_nt") + F.col("run_nt")
                         <= F.col("b"))))
            .select("doc_id", "source", "nt", "nd",
                    (F.col("nd").cast("double") / F.col("nt").cast("double"))
                    .alias("density")))


# ---------------------------------------------------------------------------
# Dataset card: the per-source one-stop summary a training-data release
# ships with (docs, tokens, exact-dup rate, language makeup) — the
# report that fronts every curated-corpus publication. One pass over
# documents (per-source aggregates with distinct-digest and
# distinct-lang counts) plus a per-source language mode via a
# source-partitioned window; every rate is a single division of
# integer counts.
# ---------------------------------------------------------------------------


@register(
    "mlprep_dataset_card",
    oracle=r"""
    WITH base AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split_regex(lower(trim(text)),
                                               '\s+'))) AS BIGINT)
                   AS n_tokens,
               CAST(COUNT(DISTINCT md5(text)) AS BIGINT)
                   AS n_distinct_texts,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        FROM documents GROUP BY source
    ),
    langs AS (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY COUNT(*) DESC, lang) AS rn
        FROM documents GROUP BY source, lang
    )
    SELECT b.source, b.n_docs, b.n_tokens,
           CAST(b.n_tokens AS DOUBLE) / CAST(b.n_docs AS DOUBLE)
               AS mean_doc_tokens,
           CAST(b.n_docs - b.n_distinct_texts AS BIGINT)
               AS n_exact_dup_docs,
           CAST(b.n_docs - b.n_distinct_texts AS DOUBLE)
               / CAST(b.n_docs AS DOUBLE) AS exact_dup_rate,
           b.n_langs, l.lang AS top_lang,
           CAST(l.c AS DOUBLE) / CAST(b.n_docs AS DOUBLE)
               AS top_lang_share
    FROM base b JOIN langs l ON l.source = b.source AND l.rn = 1
    """,
    doc="per-source dataset card (docs, whitespace tokens, exact-dup "
        "rate via distinct text digests, language count, dominant "
        "language and its share) — the release-readiness summary over "
        "one documents pass; all rates single divisions of BIGINTs",
)
def mlprep_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = (docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.expr(r"split(lower(trim(text)), '\\s+')")))
        .cast("bigint").alias("n_tokens"),
        F.countDistinct(F.md5(F.col("text").cast("binary")))
        .cast("bigint").alias("n_distinct_texts"),
        F.countDistinct("lang").cast("bigint").alias("n_langs")))
    wl = Window.partitionBy("source").orderBy(F.desc("c"), "lang")
    langs = (docs.groupBy("source", "lang")
             .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
             .withColumn("rn", F.row_number().over(wl))
             .where(F.col("rn") == 1))
    return (base.join(langs, "source")
            .select(
                "source", "n_docs", "n_tokens",
                (F.col("n_tokens").cast("double")
                 / F.col("n_docs").cast("double")).alias("mean_doc_tokens"),
                (F.col("n_docs") - F.col("n_distinct_texts"))
                .cast("bigint").alias("n_exact_dup_docs"),
                ((F.col("n_docs") - F.col("n_distinct_texts"))
                 .cast("double") / F.col("n_docs").cast("double"))
                .alias("exact_dup_rate"),
                "n_langs",
                F.col("lang").alias("top_lang"),
                (F.col("c").cast("double") / F.col("n_docs").cast("double"))
                .alias("top_lang_share")))


# ---------------------------------------------------------------------------
# Fill-in-the-middle span planning (Bavarian et al. 2022): the
# deterministic prefix/middle/suffix split plan a FIM training
# pipeline applies to half its documents. Entirely map-only — the
# 50% apply decision and both cut points derive from the portable
# 60-bit md5 hash of the doc id (the repo's established cross-engine
# hash idiom), so the plan is reproducible from ids alone and the
# oracle checks every span boundary bit-for-bit.
# ---------------------------------------------------------------------------

_FIM_MIN_TOKENS = 8


@register(
    "mlprep_fim_spans",
    oracle=rf"""
    WITH base AS (
        SELECT doc_id,
               CAST(len(string_split_regex(lower(trim(text)), '\s+'))
                    AS BIGINT) AS n_tokens,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                    AS BIGINT) AS hv
        FROM documents
    ),
    plan AS (
        SELECT doc_id, n_tokens,
               CASE WHEN hv % 2 = 0 AND n_tokens >= {_FIM_MIN_TOKENS}
                    THEN 1 ELSE 0 END AS fim_applied,
               1 + (hv // 2) % greatest(n_tokens - 2, 1) AS cut_a,
               1 + (hv // 1024) % greatest(n_tokens - 2, 1) AS cut_b
        FROM base
    )
    SELECT doc_id, n_tokens, CAST(fim_applied AS INTEGER) AS fim_applied,
           CAST(CASE WHEN fim_applied = 1
                     THEN least(cut_a, cut_b) ELSE n_tokens END
                AS BIGINT) AS prefix_len,
           CAST(CASE WHEN fim_applied = 1
                     THEN greatest(cut_a, cut_b) - least(cut_a, cut_b)
                     ELSE 0 END AS BIGINT) AS middle_len,
           CAST(CASE WHEN fim_applied = 1
                     THEN n_tokens - greatest(cut_a, cut_b)
                     ELSE 0 END AS BIGINT) AS suffix_len
    FROM plan
    """,
    doc="fill-in-the-middle span plan: 50% of documents (md5-parity "
        "of doc_id — content-addressed, reproducible) get two "
        "hash-derived cut points splitting the token range into "
        "prefix/middle/suffix; the rest pass through. Map-only, no "
        "shuffle at any scale; every boundary hash-checked",
)
def mlprep_fim_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.size(F.expr(r"split(lower(trim(text)), '\\s+')"))
        .cast("bigint").alias("n_tokens"),
        F.expr("CAST(conv(substr(md5(CAST(CAST(doc_id AS STRING) "
               "AS BINARY)), 1, 15), 16, 10) AS BIGINT)").alias("hv"))
    plan = base.select(
        "doc_id", "n_tokens",
        F.when((F.col("hv") % 2 == 0)
               & (F.col("n_tokens") >= _FIM_MIN_TOKENS), 1)
        .otherwise(0).alias("fim_applied"),
        F.expr("1 + (hv div 2) % greatest(n_tokens - 2, 1)")
        .alias("cut_a"),
        F.expr("1 + (hv div 1024) % greatest(n_tokens - 2, 1)")
        .alias("cut_b"))
    applied = F.col("fim_applied") == 1
    lo = F.least("cut_a", "cut_b")
    hi = F.greatest("cut_a", "cut_b")
    return plan.select(
        "doc_id", "n_tokens",
        F.col("fim_applied").cast("int").alias("fim_applied"),
        F.when(applied, lo).otherwise(F.col("n_tokens"))
        .cast("bigint").alias("prefix_len"),
        F.when(applied, hi - lo).otherwise(0)
        .cast("bigint").alias("middle_len"),
        F.when(applied, F.col("n_tokens") - hi).otherwise(0)
        .cast("bigint").alias("suffix_len"))


# ---------------------------------------------------------------------------
# PII loss-masking plan: pretraining pipelines that keep PII-bearing
# documents (rather than dropping them) zero the LOSS on the PII
# tokens — this is that plan, aggregated per source: how many tokens
# would be masked under the repo's email/URL/long-number patterns
# (the same regexes as text_pii_scan/redact), what fraction of the
# training signal that costs, and how many docs are touched at all.
# Map-only scan; rates are single divisions of BIGINT token counts.
# ---------------------------------------------------------------------------


@register(
    "mlprep_pii_mask_plan",
    oracle=r"""
    WITH t AS (
        SELECT source,
               string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents
    ),
    per_doc AS (
        SELECT source,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(toks,
                    x -> regexp_matches(x,
                         '^([a-za-z0-9._%+-]+@[a-za-z0-9.-]+\.[a-za-z]{2,}|https?://[^ ]+|[0-9]{6,})$')))
                    AS BIGINT) AS n_masked
        FROM t
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_masked > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs_touched,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(n_masked) AS BIGINT) AS n_tokens_masked,
           CAST(SUM(n_masked) AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE)
               AS mask_rate
    FROM per_doc GROUP BY source
    """,
    doc="PII loss-masking plan per source: tokens matching the "
        "email/URL/long-number patterns (the text_pii_scan regexes, "
        "applied token-wise) are the spans a keep-and-mask pipeline "
        "zeroes loss on — counts, touched docs, and the masked "
        "fraction of the training signal; map-only, single-division "
        "rates",
)
def mlprep_pii_mask_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pat = (r"'^([a-za-z0-9._%+-]+@[a-za-z0-9.-]+\\.[a-za-z]{2,}"
           r"|https?://[^ ]+|[0-9]{6,})$'")
    per_doc = docs.select(
        "source",
        F.expr(r"size(split(lower(trim(text)), '\\s+'))")
        .cast("bigint").alias("n_tokens"),
        F.expr(rf"size(filter(split(lower(trim(text)), '\\s+'), "
               rf"x -> x rlike {pat}))")
        .cast("bigint").alias("n_masked"))
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum(F.when(F.col("n_masked") > 0, 1).otherwise(0))
                 .cast("bigint").alias("n_docs_touched"),
                 F.sum("n_tokens").cast("bigint").alias("n_tokens"),
                 F.sum("n_masked").cast("bigint")
                 .alias("n_tokens_masked"),
                 (F.sum("n_masked").cast("double")
                  / F.sum("n_tokens").cast("double")).alias("mask_rate")))


# ---------------------------------------------------------------------------
# Training-shard plan: content-addressed assignment of documents to a
# fixed shard count with the balance report a dataloader needs —
# shard = md5-bucket of doc_id (reshuffling-free, reproducible from
# ids alone), per-shard doc/token mass, and each shard's deviation
# from perfect balance in signed ppm. Map-only scan + one bounded
# (64-row) groupBy.
# ---------------------------------------------------------------------------

_SHARDS = 64


@register(
    "mlprep_shard_plan",
    oracle=f"""
    WITH d AS (
        SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                    AS BIGINT) % {_SHARDS} AS shard,
               CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
                    AS BIGINT) AS nt
        FROM documents
    ),
    per AS (
        SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(nt) AS BIGINT) AS n_tokens
        FROM d GROUP BY shard
    ),
    tot AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS t_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_shards
        FROM per
    )
    SELECT CAST(p.shard AS INTEGER) AS shard, p.n_docs, p.n_tokens,
           CAST(p.n_tokens * t.n_shards * 1000000 // t.t_tokens
                - 1000000 AS BIGINT) AS balance_delta_ppm
    FROM per p CROSS JOIN tot t
    """,
    doc=f"training-shard plan: md5-bucketed assignment of docs to "
        f"{_SHARDS} shards (reproducible from ids — no reshuffle on "
        "re-run), per-shard doc/token mass and signed deviation from "
        "perfect token balance in ppm — the dataloader-balance audit "
        "before a distributed epoch; map-only + bounded groupBy",
)
def mlprep_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        (F.expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15),"
                " 16, 10) AS BIGINT)") % _SHARDS).alias("shard"),
        F.size(F.expr(r"split(lower(trim(text)), '\\s+')"))
        .cast("bigint").alias("nt"))
    per = d.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("nt").cast("bigint").alias("n_tokens"))
    tot = per.agg(F.sum("n_tokens").cast("bigint").alias("t_tokens"),
                  F.count(F.lit(1)).cast("bigint").alias("n_shards"))
    return (per.join(F.broadcast(tot))
            .select(F.col("shard").cast("int").alias("shard"),
                    "n_docs", "n_tokens",
                    F.expr("n_tokens * n_shards * 1000000 div t_tokens"
                           " - 1000000")
                    .cast("bigint").alias("balance_delta_ppm")))


# ---------------------------------------------------------------------------
# Contamination-safe train/valid/test split: split_train_test assigns
# DOCUMENTS independently, so two byte-identical copies of one
# document can land in train AND test — the classic eval-leakage bug a
# dedup-aware pipeline must refuse. The fix is to assign whole
# EXACT-DUP CLUSTERS: the split key is md5(md5(text)) — a pure
# function of the cluster digest — so every copy of a text lands on
# the same side BY CONSTRUCTION (no leakage check needed; there is
# nothing to check). Report is the per-split census with the dup mass
# that the naive split would have scattered. Scale shape: one shuffle
# on the digest (the exact-dedup groupBy), then a 3-row groupBy —
# same cost as exact dedup itself.
# ---------------------------------------------------------------------------

_CLUSTER_SPLIT_SQL = """
CASE WHEN substr(md5(d), 1, 2) < 'cc' THEN 'train'
     WHEN substr(md5(d), 1, 2) < 'e6' THEN 'valid'
     ELSE 'test' END
"""


@register(
    "mlprep_cluster_holdout_split",
    oracle=f"""
    WITH g AS (
        SELECT md5(text) AS d, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars
        FROM documents GROUP BY md5(text)
    )
    SELECT {_CLUSTER_SPLIT_SQL} AS split,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_clusters,
           CAST(SUM(n - 1) AS BIGINT) AS n_dup_extra_docs,
           CAST(SUM(chars) AS BIGINT) AS total_chars
    FROM g GROUP BY 1
    """,
    doc="contamination-safe holdout split: whole exact-dup clusters "
        "assigned by md5 of the cluster digest, so identical documents "
        "can never straddle train/test (eval leakage refused by "
        "construction, not audited after the fact); per-split census "
        "reports the dup mass the naive per-document split would have "
        "scattered. One digest shuffle — the cost of exact dedup",
)
def mlprep_cluster_holdout_split(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    g = (docs.withColumn("d", F.md5(F.col("text").cast("binary")))
         .groupBy("d")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
              F.sum(F.col("n_chars").cast("bigint")).cast("bigint")
              .alias("chars")))
    bucket = F.substring(F.md5(F.col("d").cast("binary")), 1, 2)
    split = (F.when(bucket < "cc", "train")
             .when(bucket < "e6", "valid")
             .otherwise("test"))
    return (g.groupBy(split.alias("split"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
                 F.sum("n").cast("bigint").alias("n_docs"),
                 F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
                 .cast("bigint").alias("n_dup_clusters"),
                 F.sum(F.col("n") - 1).cast("bigint")
                 .alias("n_dup_extra_docs"),
                 F.sum("chars").cast("bigint").alias("total_chars")))


# ---------------------------------------------------------------------------
# Sequence-length capacity curve: the OTHER padding audit.
# mlprep_length_bucket_padding_waste prices fixed-shape INFERENCE
# batching (pad each doc up to its 64-boundary); this query prices
# TRAINING chunking — a document of t tokens becomes ceil(t/L) rows of
# a fixed max_len L, and only the last chunk carries pad — swept over
# candidate L values in one pass. The curve (chunk count, pad mass,
# waste ppm per L) is the evidence for choosing max_len before a run:
# small L wastes little pad but multiplies rows/attention resets; big
# L wastes pad on short docs. Scale shape: the per-doc token count is
# one map-only scan, the candidate sweep is a 5-way explode of ONE
# integer column (not the text), and the groupBy lands on the 5-row
# candidate spine. Integer-exact until the final waste rate.
# ---------------------------------------------------------------------------

_SEQLEN_CANDIDATES = (64, 128, 256, 512, 1024)


@register(
    "mlprep_seqlen_capacity_curve",
    oracle=f"""
    WITH tok AS (
        SELECT CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
                    AS BIGINT) AS nt
        FROM documents
    ),
    cand AS (SELECT unnest([{", ".join(str(c) for c in _SEQLEN_CANDIDATES)}])
                    AS max_len),
    sweep AS (
        SELECT max_len, nt, (nt + max_len - 1) // max_len AS n_chunks
        FROM tok, cand
    )
    SELECT CAST(max_len AS INTEGER) AS max_len,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
           CAST(SUM(n_chunks) * max_len AS BIGINT) AS padded_tokens,
           CAST((1000000 * (SUM(n_chunks) * max_len - SUM(nt)))
                // (SUM(n_chunks) * max_len) AS BIGINT) AS waste_ppm
    FROM sweep GROUP BY max_len
    """,
    doc="training-chunking capacity curve: padded token mass and waste "
        "ppm at each candidate max_len (docs become ceil(t/L) chunks, "
        "pad only in the last) — the seq-len selection evidence; one "
        "token-count scan, a 5-way explode of one integer column, "
        "5-row output",
)
def mlprep_seqlen_capacity_curve(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cands = "array(" + ", ".join(str(c) for c in _SEQLEN_CANDIDATES) + ")"
    sweep = (docs.select(
                F.size(F.expr(r"split(lower(trim(text)), '\\s+')"))
                .cast("bigint").alias("nt"))
             .select("nt", F.explode(F.expr(cands)).alias("max_len"))
             .withColumn("n_chunks",
                         F.expr("(nt + max_len - 1) div max_len")))
    g = (sweep.groupBy(F.col("max_len").cast("int").alias("max_len"))
         .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
              F.sum("nt").cast("bigint").alias("total_tokens"),
              F.sum("n_chunks").cast("bigint").alias("n_chunks")))
    padded = (F.col("n_chunks") * F.col("max_len")).cast("bigint")
    return g.select(
        "max_len", "n_docs", "total_tokens", "n_chunks",
        padded.alias("padded_tokens"),
        F.expr("(1000000 * (n_chunks * max_len - total_tokens))"
               " div (n_chunks * max_len)").cast("bigint")
        .alias("waste_ppm"))


# ---------------------------------------------------------------------------
# Epoch shuffle plan (round 12): multi-epoch training must visit the
# SAME shards in a DIFFERENT, reproducible order each epoch — runs
# that resume mid-epoch, re-run on another cluster, or audit a loss
# spike all need the visit order to be a pure function of
# (epoch, shard), never of scheduler timing. The plan keys shard
# visit order on a multiplicative hash of (shard, epoch); the shard
# census (docs, chars) comes from one documents scan and the
# epoch x shard plan is a bounded broadcast spine.
# ---------------------------------------------------------------------------

_SHUFFLE_SHARDS = 16
_SHUFFLE_EPOCHS = 3
# Knuth's 2^32 golden-ratio multiplier SCALED per epoch: the whole
# product wraps the Mersenne modulus differently for each epoch
# factor, so every epoch ranks shards under a genuinely different
# permutation (verified: 3 epochs -> 3 distinct orders at 16 shards).
# An additive epoch term — or one too small to cross the inter-shard
# gaps — would shift every mix together and leave the order
# unchanged. Constants are stated in both engines' SQL so the plan is
# cross-engine reproducible by construction; the largest intermediate
# is 16 * 2654435761 * 3 ~ 1.3e11, far inside int64.
_SHUFFLE_MIX = ("((shard_id + 1) * 2654435761 * (epoch + 1)) "
                "% 2147483647")


@register(
    "mlprep_epoch_shuffle_plan",
    oracle=f"""
    WITH s AS (
        SELECT doc_id % {_SHUFFLE_SHARDS} AS shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM documents GROUP BY 1
    ),
    e AS (SELECT UNNEST(range(0, {_SHUFFLE_EPOCHS})) AS epoch),
    m AS (
        SELECT e.epoch, s.shard_id, s.n_docs, s.n_chars,
               {_SHUFFLE_MIX} AS mix
        FROM e CROSS JOIN s
    )
    SELECT CAST(epoch AS INTEGER) AS epoch,
           CAST(shard_id AS INTEGER) AS shard_id, n_docs, n_chars,
           CAST(ROW_NUMBER() OVER (PARTITION BY epoch
                                   ORDER BY mix, shard_id)
                AS INTEGER) AS visit_order
    FROM m
    """,
    doc="reproducible multi-epoch shard visit order: shard census from "
        "one documents scan, visit order = rank of a stated "
        "multiplicative hash of (shard, epoch) — a pure function of "
        "the plan key, identical on any engine/cluster/restart; "
        "bounded epoch x shard spine",
)
def mlprep_epoch_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    s = (docs.groupBy((F.col("doc_id") % _SHUFFLE_SHARDS)
                      .alias("shard_id"))
         .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
              F.sum("n_chars").cast("bigint").alias("n_chars")))
    e = spark.range(_SHUFFLE_EPOCHS).select(F.col("id").alias("epoch"))
    m = (s.join(F.broadcast(e), F.lit(True))
         .withColumn("mix", F.expr(_SHUFFLE_MIX)))
    w = Window.partitionBy("epoch").orderBy("mix", "shard_id")
    return (m.withColumn("visit_order", F.row_number().over(w).cast("int"))
            .select(F.col("epoch").cast("int").alias("epoch"),
                    F.col("shard_id").cast("int").alias("shard_id"),
                    "n_docs", "n_chars", "visit_order"))


# ---------------------------------------------------------------------------
# Packing-fragmentation histogram (round 14): with concat-and-chunk
# packing, every document spans chunk_start..chunk_end — a doc that
# spans many chunks is sliced into that many attention-fragmented
# pieces. The span distribution (octave-banded: span 1 = intact, 2 =
# cut once, ...) against token mass is the evidence for choosing
# max_seq_len: it prices "how much of the corpus gets shredded" at a
# given budget. Same exact integer prefix sum as
# mlprep_sequence_packing (one window per source shard), one bounded
# <=64-band rollup.
# ---------------------------------------------------------------------------

@register(
    "mlprep_packing_span_histogram",
    oracle=f"""
    WITH tok AS (
        SELECT source, doc_id,
               len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tok
        FROM documents
    ),
    cum AS (
        SELECT source, doc_id, n_tok,
               SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum_incl
        FROM tok
    ),
    span AS (
        SELECT ((cum_incl - 1) // {_PACK_MAX_LEN})
               - ((cum_incl - n_tok) // {_PACK_MAX_LEN}) + 1 AS n_spans,
               n_tok
        FROM cum
    )
    SELECT CAST(length(bin(n_spans)) AS INTEGER) AS span_band,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(MAX(n_spans) AS BIGINT) AS max_spans
    FROM span GROUP BY 1
    """,
    doc="octave-banded histogram of how many max_seq_len=512 chunks "
        "each packed document spans (band 1 = intact docs, higher "
        "bands = docs shredded across 2^(b-1)..2^b-1 chunks) with "
        "the token mass per band — prices attention fragmentation "
        "for the packing budget; exact integer prefix sum per source "
        "shard, bounded <=64-band output",
)
def mlprep_packing_span_histogram(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    m = _PACK_MAX_LEN
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", "doc_id",
        F.size(F.expr(r"split(lower(trim(text)), '\\s+')"))
        .cast("bigint").alias("n_tok"))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    span = (tok.withColumn("cum_incl", F.sum("n_tok").over(w))
            .select(((F.expr(f"(cum_incl - 1) div {m}"))
                     - F.expr(f"(cum_incl - n_tok) div {m}") + 1)
                    .alias("n_spans"), "n_tok"))
    return (span.groupBy(F.length(F.bin(F.col("n_spans"))).cast("int")
                         .alias("span_band"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("n_tok").cast("bigint").alias("total_tokens"),
                 F.max("n_spans").cast("bigint").alias("max_spans")))
