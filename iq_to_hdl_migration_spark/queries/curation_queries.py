"""Corpus-curation and segmentation analytics (SURVEY §2.11): the
queries a training-data pipeline runs to decide what to KEEP — dedup
survivorship by source, per-language length profiles, RFM-style entity
segmentation, and load-seasonality grids.

Scale notes:
- Survivorship derives keep/drop from a window MIN over the content
  hash — ONE shuffle on the hash (uniform by construction), no join of
  the corpus with itself.
- RFM uses the 2-pass global-threshold pattern (exact medians computed
  once, broadcast as literals) rather than NTILE's single-partition
  global sort — same design as `decile_binned_revenue`.
- Seasonality aggregates to a fixed 7x24 grid — the shuffle key space
  is constant regardless of data volume, and partial aggregation does
  almost all the work map-side.

Determinism: money/value sums accumulate per-value-cast decimals;
every emitted float is one double division (or an exact-percentile
interpolation, identical in both engines); day-of-week is normalized
to DuckDB's dow() numbering (0=Sunday).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from iq_to_hdl_migration_spark.queries import register
from iq_to_hdl_migration_spark.sources.tables import load_table

_TP = "CAST(o_totalprice AS DECIMAL(14,2))"
_VAL = "CAST(value AS DECIMAL(18,6))"


@register(
    "dedup_survivorship",
    oracle="""
    WITH g AS (
        SELECT source, doc_id,
               MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN doc_id = keep_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN doc_id = keep_id THEN 0 ELSE 1 END)
                AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN doc_id = keep_id THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS keep_rate
    FROM g GROUP BY source
    """,
    doc="Exact-dedup survivorship by source: global min-doc_id-wins "
        "over the content hash (window MIN on the hash — one shuffle, "
        "no self-join), then keep/drop rollup. SURVEY §2.11 dedup.",
)
def dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.col("text").cast("binary")))
    g = docs.select(
        "source", "doc_id",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("kept"))
    kept = F.sum(F.when(F.col("kept"), 1).otherwise(0))
    return g.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        kept.cast("bigint").alias("n_kept"),
        F.sum(F.when(F.col("kept"), 0).otherwise(1)).cast("bigint")
            .alias("n_dropped"),
        (kept.cast("double") / F.count(F.lit(1)).cast("double"))
            .alias("keep_rate"),
    )


@register(
    "doc_length_quartiles_by_lang",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           quantile_cont(n_chars, 0.25) AS q25,
           quantile_cont(n_chars, 0.50) AS q50,
           quantile_cont(n_chars, 0.75) AS q75,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY lang
    """,
    doc="Per-language document-length profile (exact interpolated "
        "quartiles — same cross-engine-stable pattern as "
        "stats_price_quantiles). SURVEY §2.11 text analysis.",
)
def doc_length_quartiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("percentile(n_chars, 0.25)").alias("q25"),
        F.expr("percentile(n_chars, 0.50)").alias("q50"),
        F.expr("percentile(n_chars, 0.75)").alias("q75"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


@register(
    "orders_rfm_segments",
    oracle=f"""
    WITH c AS (
        SELECT o_custkey,
               date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                         (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders))
                   AS recency,
               COUNT(*) AS frequency,
               CAST(SUM({_TP}) AS DECIMAL(18,2)) AS monetary
        FROM orders GROUP BY o_custkey
    ), t AS (
        SELECT quantile_cont(recency, 0.5) AS tr,
               quantile_cont(frequency, 0.5) AS tf,
               quantile_cont(monetary, 0.5) AS tm
        FROM c
    )
    SELECT (recency <= tr) AS r_active,
           (frequency > tf) AS f_high,
           (CAST(monetary AS DOUBLE) > tm) AS m_high,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary) AS DOUBLE) AS monetary_total
    FROM c CROSS JOIN t
    GROUP BY 1, 2, 3
    """,
    doc="RFM segmentation: per-customer recency/frequency/monetary, "
        "median-split each axis (2-pass global thresholds broadcast as "
        "literals — no NTILE global sort), count the 8 segments. "
        "SURVEY §2.11 ML prep.",
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max(F.col("o_orderdate").cast("date"))).first()[0]
    c = o.groupBy("o_custkey").agg(
        F.datediff(F.lit(anchor),
                   F.max(F.col("o_orderdate").cast("date"))).alias("recency"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            .cast("decimal(18,2)").alias("monetary"),
    )
    tr, tf, tm = c.agg(
        F.expr("percentile(recency, 0.5)"),
        F.expr("percentile(frequency, 0.5)"),
        F.expr("percentile(monetary, 0.5)"),
    ).first()
    return c.groupBy(
        (F.col("recency") <= F.lit(tr)).alias("r_active"),
        (F.col("frequency") > F.lit(tf)).alias("f_high"),
        (F.col("monetary").cast("double") > F.lit(tm)).alias("m_high"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("monetary").cast("double").alias("monetary_total"),
    )


@register(
    "events_hourly_seasonality",
    oracle=f"""
    SELECT CAST(dayofweek(ts) AS INTEGER) AS dow,
           CAST(hour(ts) AS INTEGER) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM({_VAL}) AS DOUBLE) AS sum_value,
           CAST(SUM({_VAL}) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS avg_value
    FROM events GROUP BY 1, 2
    """,
    doc="Load-seasonality grid (day-of-week x hour-of-day, normalized "
        "to DuckDB dow numbering 0=Sunday): constant-size shuffle key "
        "space, map-side partial agg does the work. SURVEY §2.11.",
)
def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    val = F.col("value").cast("decimal(18,6)")
    return (
        ev.groupBy(
            (F.dayofweek("ts") - F.lit(1)).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hour"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
             F.sum(val).cast("double").alias("sum_value"),
             (F.sum(val).cast("double")
              / F.count(F.lit(1)).cast("double")).alias("avg_value"))
    )


@register(
    "events_new_vs_returning",
    oracle="""
    WITH fd AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
        FROM events GROUP BY user_id
    )
    SELECT CAST(e.ts AS DATE) AS day,
           CAST(SUM(CASE WHEN CAST(e.ts AS DATE) = fd.first_day
                         THEN 1 ELSE 0 END) AS BIGINT) AS new_events,
           CAST(SUM(CASE WHEN CAST(e.ts AS DATE) > fd.first_day
                         THEN 1 ELSE 0 END) AS BIGINT) AS returning_events,
           CAST(COUNT(DISTINCT CASE WHEN CAST(e.ts AS DATE) = fd.first_day
                                    THEN e.user_id END) AS BIGINT)
               AS new_users,
           CAST(COUNT(DISTINCT CASE WHEN CAST(e.ts AS DATE) > fd.first_day
                                    THEN e.user_id END) AS BIGINT)
               AS returning_users
    FROM events e JOIN fd ON e.user_id = fd.user_id
    GROUP BY 1
    """,
    doc="New-vs-returning split per day: per-user first-day derived "
        "once (groupBy on user_id), joined back on the same key — both "
        "sides share the user_id partitioning, and the daily rollup is "
        "constant-size. SURVEY §2.11 growth analytics.",
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select("user_id", F.col("ts").cast("date").alias("day"))
    fd = d.groupBy("user_id").agg(F.min("day").alias("first_day"))
    j = d.join(fd, "user_id")
    is_new = F.col("day") == F.col("first_day")
    return j.groupBy("day").agg(
        F.sum(F.when(is_new, 1).otherwise(0)).cast("bigint")
            .alias("new_events"),
        F.sum(F.when(~is_new, 1).otherwise(0)).cast("bigint")
            .alias("returning_events"),
        F.countDistinct(F.when(is_new, F.col("user_id"))).cast("bigint")
            .alias("new_users"),
        F.countDistinct(F.when(~is_new, F.col("user_id"))).cast("bigint")
            .alias("returning_users"),
    )


@register(
    "docs_cross_source_duplication",
    oracle="""
    WITH hs AS (
        SELECT md5(text) AS h, source, COUNT(*) AS c
        FROM documents GROUP BY 1, 2
    ), p AS (
        SELECT a.source AS source_a, b.source AS source_b,
               SUM(CASE WHEN a.source = b.source
                        THEN a.c * (a.c - 1) // 2
                        ELSE a.c * b.c END) AS n_dup_pairs
        FROM hs a JOIN hs b ON a.h = b.h AND a.source <= b.source
        GROUP BY 1, 2
    )
    SELECT source_a, source_b, CAST(n_dup_pairs AS BIGINT) AS n_dup_pairs
    FROM p WHERE n_dup_pairs > 0
    """,
    doc="Duplication matrix across sources: exact-duplicate doc pairs "
        "within each source (diagonal) and across source pairs "
        "(off-diagonal), computed from per-(hash, source) COUNTS — "
        "per-hash state is bounded by #sources even if one content "
        "has millions of copies, and pair counts are closed-form "
        "(c*(c-1)/2, c_a*c_b), never an explode of the copies. "
        "SURVEY §2.11 dedup.",
)
def docs_cross_source_duplication(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hs = (docs.groupBy(F.md5(F.col("text").cast("binary")).alias("h"),
                       "source")
          .agg(F.count(F.lit(1)).alias("c")))
    per_hash = hs.groupBy("h").agg(
        F.collect_list(F.struct("source", "c")).alias("sc"))
    a = F.explode("sc").alias("a")
    pairs = (per_hash.select(a, "sc")
             .select("a", F.explode("sc").alias("b"))
             .where(F.col("a.source") <= F.col("b.source"))
             .select(
                 F.col("a.source").alias("source_a"),
                 F.col("b.source").alias("source_b"),
                 F.when(F.col("a.source") == F.col("b.source"),
                        (F.col("a.c") * (F.col("a.c") - 1) / 2)
                        .cast("bigint"))
                  .otherwise(F.col("a.c") * F.col("b.c"))
                  .alias("np")))
    return (pairs.groupBy("source_a", "source_b")
            .agg(F.sum("np").cast("bigint").alias("n_dup_pairs"))
            .where(F.col("n_dup_pairs") > 0))


_SW_DUCK_CUR = "['the', 'a', 'and', 'of', 'to', 'in', 'is']"
_SW_SPARK_CUR = "array('the', 'a', 'and', 'of', 'to', 'in', 'is')"
_TOK_DUCK_CUR = r"string_split_regex(lower(trim(text)), '\s+')"
_TOK_SPARK_CUR = r"split(lower(trim(text)), '\\s+')"


@register(
    "curation_funnel_report",
    # each stage is a strictly narrowing predicate; the report is the
    # survivor count per stage — one scan, conditional aggregation,
    # no per-stage re-reads
    oracle=f"""
    WITH flags AS (
        SELECT doc_id,
               (n_chars >= 100) AS pass_len,
               (n_chars >= 100 AND
                CAST(len(list_filter({_TOK_DUCK_CUR},
                         x -> list_contains({_SW_DUCK_CUR}, x))) AS DOUBLE)
                    / CAST(greatest(len({_TOK_DUCK_CUR}), 1) AS DOUBLE)
                    >= 0.05) AS pass_quality,
               (doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)))
                   AS is_keeper
        FROM documents
    )
    SELECT stage, n_docs,
           CAST(n_docs AS DOUBLE)
               / CAST(MAX(n_docs) OVER () AS DOUBLE) AS survival_rate
    FROM (
        SELECT '0_ingested' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM flags
        UNION ALL
        SELECT '1_min_length', CAST(SUM(CASE WHEN pass_len THEN 1 ELSE 0
                                        END) AS BIGINT)
        FROM flags
        UNION ALL
        SELECT '2_quality', CAST(SUM(CASE WHEN pass_quality THEN 1 ELSE 0
                                     END) AS BIGINT)
        FROM flags
        UNION ALL
        SELECT '3_exact_dedup', CAST(SUM(CASE WHEN pass_quality AND
                                         is_keeper THEN 1 ELSE 0 END)
                                     AS BIGINT)
        FROM flags
    ) s
    """,
    doc="the curation funnel: ingested -> min-length -> stopword-ratio "
        "quality -> exact-dedup survivor counts with survival rates — "
        "the keep/drop dashboard a corpus build runs per snapshot; one "
        "scan, conditional aggregation, window-min dedup (no self-join)",
)
def curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sw_ratio = (f"CAST(size(filter({_TOK_SPARK_CUR}, "
                f"x -> array_contains({_SW_SPARK_CUR}, x))) AS DOUBLE)"
                f" / CAST(greatest(size({_TOK_SPARK_CUR}), 1) AS DOUBLE)")
    w = Window.partitionBy(F.expr("md5(CAST(text AS BINARY))"))
    flags = docs.select(
        "doc_id",
        (F.col("n_chars") >= 100).alias("pass_len"),
        ((F.col("n_chars") >= 100)
         & (F.expr(sw_ratio) >= 0.05)).alias("pass_quality"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_keeper"))
    stages = flags.agg(
        F.count(F.lit(1)).alias("0_ingested"),
        F.sum(F.when(F.col("pass_len"), 1).otherwise(0))
        .alias("1_min_length"),
        F.sum(F.when(F.col("pass_quality"), 1).otherwise(0))
        .alias("2_quality"),
        F.sum(F.when(F.col("pass_quality") & F.col("is_keeper"), 1)
              .otherwise(0)).alias("3_exact_dedup"))
    long = stages.unpivot([], ["0_ingested", "1_min_length", "2_quality",
                               "3_exact_dedup"], "stage", "n_docs")
    wmax = Window.partitionBy()
    return (long.select(
        "stage", F.col("n_docs").cast("bigint").alias("n_docs"),
        (F.col("n_docs").cast("double")
         / F.max("n_docs").over(wmax).cast("double"))
        .alias("survival_rate")))


@register(
    "corpus_token_budget",
    oracle=f"""
    WITH t AS (
        SELECT source, lang,
               CAST(len({_TOK_DUCK_CUR}) AS BIGINT) AS n_tok
        FROM documents
    )
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_tok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS avg_tokens,
           CAST(SUM(n_tok) AS DOUBLE)
               / CAST(SUM(SUM(n_tok)) OVER () AS DOUBLE) AS corpus_share
    FROM t GROUP BY source, lang
    """,
    doc="per-(source, lang) token budget: docs, total/avg tokens and "
        "share of corpus — the training-mix planning report; one "
        "shuffle to (source, lang), the share via a window over the "
        "tiny aggregated grid",
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    agg = (docs
           .select("source", "lang",
                   F.expr(f"CAST(size({_TOK_SPARK_CUR}) AS BIGINT)")
                   .alias("n_tok"))
           .groupBy("source", "lang")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tok").alias("total_tokens")))
    w = Window.partitionBy()
    return agg.select(
        "source", "lang", "n_docs",
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        (F.col("total_tokens").cast("double")
         / F.col("n_docs").cast("double")).alias("avg_tokens"),
        (F.col("total_tokens").cast("double")
         / F.sum("total_tokens").over(w).cast("double"))
        .alias("corpus_share"))


# ---------------------------------------------------------------------------
# lang x source independence audit: Pearson chi-square statistic over
# the contingency table — the "is my language mix uniform across
# ingest sources" check a corpus review runs. Expected counts and cell
# terms are short deterministic double chains; each cell term is
# floor-snapped to 2^-20 fixed point so the final sum accumulates
# EXACTLY as BIGINT (float sums over cells would be order-dependent) —
# the same portability discipline as the quantization audit.
# ---------------------------------------------------------------------------

@register(
    "docs_lang_source_independence",
    oracle="""
    WITH o AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS obs
        FROM documents GROUP BY lang, source
    ),
    rt AS (SELECT lang, CAST(SUM(obs) AS BIGINT) AS r FROM o GROUP BY lang),
    ct AS (SELECT source, CAST(SUM(obs) AS BIGINT) AS c FROM o
           GROUP BY source),
    n AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM o),
    cells AS (
        SELECT o.lang, o.source, o.obs,
               CAST(rt.r * ct.c AS DOUBLE) / CAST(n.n AS DOUBLE) AS e
        FROM o JOIN rt ON rt.lang = o.lang
        JOIN ct ON ct.source = o.source CROSS JOIN n
    ),
    snapped AS (
        SELECT CAST(FLOOR((((CAST(obs AS DOUBLE) - e)
                            * (CAST(obs AS DOUBLE) - e)) / e)
                          * 1048576.0) AS BIGINT) AS tq
        FROM cells
    )
    SELECT CAST((SELECT COUNT(*) FROM cells) AS BIGINT) AS n_cells,
           CAST(((SELECT COUNT(*) FROM rt) - 1)
                * ((SELECT COUNT(*) FROM ct) - 1) AS BIGINT) AS dof,
           CAST(SUM(tq) AS DOUBLE) / 1048576.0 AS chi2
    FROM snapped
    """,
    doc="Pearson chi-square for lang x source independence over the "
        "observed contingency cells — fixed-point cell terms make the "
        "statistic bit-exact across engines; cells with zero observed "
        "count contribute via the marginals only (standard sparse form)",
)
def docs_lang_source_independence(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    o = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("obs"))
    rt = o.groupBy("lang").agg(F.sum("obs").cast("bigint").alias("r"))
    ct = o.groupBy("source").agg(F.sum("obs").cast("bigint").alias("c"))
    n = o.agg(F.sum("obs").cast("bigint").alias("n"))
    cells = (o.join(F.broadcast(rt), "lang")
             .join(F.broadcast(ct), "source")
             .join(F.broadcast(n)))
    e = (F.col("r") * F.col("c")).cast("double") / F.col("n").cast("double")
    od = F.col("obs").cast("double")
    tq = F.floor((((od - e) * (od - e)) / e) * F.lit(1048576.0)) \
        .cast("bigint")
    snapped = cells.select(tq.alias("tq"))
    n_cells = o.agg(F.count(F.lit(1)).cast("bigint").alias("n_cells"))
    dof = (rt.agg(F.count(F.lit(1)).alias("nr"))
           .join(ct.agg(F.count(F.lit(1)).alias("nc")))
           .select(((F.col("nr") - 1) * (F.col("nc") - 1))
                   .cast("bigint").alias("dof")))
    chi2 = snapped.agg(
        (F.sum("tq").cast("double") / F.lit(1048576.0)).alias("chi2"))
    return n_cells.join(F.broadcast(dof)).join(F.broadcast(chi2))


# ---------------------------------------------------------------------------
# Per-rule filter attrition: curation_funnel_report shows SEQUENTIAL
# survival; this shows each rule's INDEPENDENT kill count per source —
# the "which filter costs me how much data, where" readout a pipeline
# owner reads before tuning thresholds (C4/Gopher-style rule suites).
# Four rules, all map-only array expressions over one scan (no explode,
# no join): token-count window, stopword floor, duplicate-token
# fraction ceiling, and language-ID disagreement with the label.
# ---------------------------------------------------------------------------


def _attrition_oracle() -> str:
    from iq_to_hdl_migration_spark.queries.text_queries import (
        _MC_D, _SW_DUCK, _TOKS_DUCK, _langid_case)
    return f"""
    WITH f AS (
        SELECT source,
               (len({_TOKS_DUCK}) < 10 OR len({_TOKS_DUCK}) > 400)
                   AS fail_len,
               (CAST(len(list_filter({_TOKS_DUCK},
                         x -> list_contains({_SW_DUCK}, x))) AS DOUBLE)
                    / CAST(greatest(len({_TOKS_DUCK}), 1) AS DOUBLE)
                    < 0.05) AS fail_stop,
               (CAST(len({_TOKS_DUCK})
                     - len(list_distinct({_TOKS_DUCK})) AS DOUBLE)
                    / CAST(greatest(len({_TOKS_DUCK}), 1) AS DOUBLE)
                    > 0.5) AS fail_rep,
               ({_langid_case(_MC_D)} != lang) AS fail_lang
        FROM documents
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN fail_len THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fail_len,
           CAST(SUM(CASE WHEN fail_stop THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fail_stop,
           CAST(SUM(CASE WHEN fail_rep THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fail_rep,
           CAST(SUM(CASE WHEN fail_lang THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fail_lang,
           CAST(SUM(CASE WHEN NOT (fail_len OR fail_stop OR fail_rep
                                   OR fail_lang)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all,
           CAST(SUM(CASE WHEN NOT (fail_len OR fail_stop OR fail_rep
                                   OR fail_lang)
                         THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS pass_rate
    FROM f GROUP BY source
    """


@register(
    "curation_filter_attrition",
    oracle=_attrition_oracle(),
    doc="per-rule filter attrition by source: independent kill counts "
        "for the four-rule quality suite (token-count window 10..400, "
        "stopword ratio >= 0.05, duplicate-token fraction <= 0.5, "
        "language-ID agreement with the label) plus the pass-all count "
        "and rate — the threshold-tuning readout; one scan, map-only "
        "array expressions, one groupBy(source)",
)
def curation_filter_attrition(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    from iq_to_hdl_migration_spark.queries.text_queries import (
        _MC_S, _SW_SQL, _TOKS_SPARK, _langid_case)

    docs = load_table(spark, sf_dir, "documents")
    nt = f"size({_TOKS_SPARK})"
    nstop = (f"size(filter({_TOKS_SPARK}, "
             f"x -> array_contains({_SW_SQL}, x)))")
    ndup = f"size({_TOKS_SPARK}) - size(array_distinct({_TOKS_SPARK}))"
    f = docs.select(
        "source",
        F.expr(f"({nt} < 10 OR {nt} > 400)").alias("fail_len"),
        F.expr(f"CAST({nstop} AS DOUBLE) "
               f"/ CAST(greatest({nt}, 1) AS DOUBLE) < 0.05")
        .alias("fail_stop"),
        F.expr(f"CAST({ndup} AS DOUBLE) "
               f"/ CAST(greatest({nt}, 1) AS DOUBLE) > 0.5")
        .alias("fail_rep"),
        F.expr(f"({_langid_case(_MC_S)}) != lang").alias("fail_lang"))
    passed = ~(F.col("fail_len") | F.col("fail_stop")
               | F.col("fail_rep") | F.col("fail_lang"))
    return (f.groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum(F.when(F.col("fail_len"), 1).otherwise(0))
                 .cast("bigint").alias("n_fail_len"),
                 F.sum(F.when(F.col("fail_stop"), 1).otherwise(0))
                 .cast("bigint").alias("n_fail_stop"),
                 F.sum(F.when(F.col("fail_rep"), 1).otherwise(0))
                 .cast("bigint").alias("n_fail_rep"),
                 F.sum(F.when(F.col("fail_lang"), 1).otherwise(0))
                 .cast("bigint").alias("n_fail_lang"),
                 F.sum(F.when(passed, 1).otherwise(0)).cast("bigint")
                 .alias("n_pass_all"),
                 (F.sum(F.when(passed, 1).otherwise(0)).cast("double")
                  / F.count(F.lit(1)).cast("double")).alias("pass_rate")))


# ---------------------------------------------------------------------------
# Filter-policy what-if: before committing a quality-filter policy, a
# curation pipeline asks "what would each candidate policy keep?" —
# answered here for four policy bundles (min token count, min stopword
# percent, min unique-token percent) in ONE corpus scan: the per-doc
# integer features are computed once, the policy spine (4 rows) is
# exploded against them map-side, and the verdict predicates are pure
# integer comparisons (n_stop*100 >= pct*nt — no float thresholds), so
# both engines agree bit-for-bit. Output is one row per policy with
# the surviving doc/token mass — the decision table, not the doc list.
# ---------------------------------------------------------------------------

_POLICIES = [
    # (policy, min_tokens, min_stopword_pct, min_unique_pct)
    ("strict", 20, 5, 60),
    ("moderate", 10, 2, 40),
    ("lenient", 5, 0, 20),
    ("length_only", 10, 0, 0),
]


@register(
    "curation_policy_whatif",
    oracle=rf"""
    WITH feat AS (
        SELECT CAST(len(string_split_regex(lower(trim(text)), '\s+'))
                    AS BIGINT) AS nt,
               CAST(len(list_filter(
                        string_split_regex(lower(trim(text)), '\s+'),
                        x -> list_contains(['the','and','der','und','el',
                                            'la','le','et'], x)))
                    AS BIGINT) AS n_stop,
               CAST(len(list_distinct(
                        string_split_regex(lower(trim(text)), '\s+')))
                    AS BIGINT) AS n_uniq
        FROM documents
    ),
    pol AS (
        SELECT * FROM (VALUES {", ".join(
            f"('{p}', {a}, {b}, {c})" for p, a, b, c in _POLICIES)})
            p(policy, min_tokens, min_stop_pct, min_uniq_pct)
    ),
    sweep AS (
        SELECT policy, nt,
               CASE WHEN nt >= min_tokens
                     AND n_stop * 100 >= min_stop_pct * nt
                     AND n_uniq * 100 >= min_uniq_pct * nt
                    THEN 1 ELSE 0 END AS keep
        FROM feat, pol
    )
    SELECT policy,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(keep) AS BIGINT) AS n_kept,
           CAST(SUM(keep * nt) AS BIGINT) AS kept_tokens,
           CAST((1000000 * SUM(keep)) // COUNT(*) AS BIGINT)
               AS survival_ppm
    FROM sweep GROUP BY policy
    """,
    doc="quality-filter policy what-if: surviving doc/token mass per "
        "candidate policy bundle (min tokens, stopword pct, unique-"
        "token pct) from ONE corpus scan — integer-exact predicates, "
        "a 4-row policy spine exploded map-side, the decision table "
        "a curation pipeline reads before committing a filter",
)
def curation_policy_whatif(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = r"split(lower(trim(text)), '\\s+')"
    sw = "array('the','and','der','und','el','la','le','et')"
    feat = docs.select(
        F.expr(f"CAST(size({toks}) AS BIGINT)").alias("nt"),
        F.expr(f"CAST(size(filter({toks}, "
               f"x -> array_contains({sw}, x))) AS BIGINT)").alias("n_stop"),
        F.expr(f"CAST(size(array_distinct({toks})) AS BIGINT)")
        .alias("n_uniq"))
    spine = "array(" + ", ".join(
        f"named_struct('policy', '{p}', 'min_tokens', {a}, "
        f"'min_stop_pct', {b}, 'min_uniq_pct', {c})"
        for p, a, b, c in _POLICIES) + ")"
    sweep = (feat.select("nt", "n_stop", "n_uniq",
                         F.explode(F.expr(spine)).alias("p"))
             .select("nt",
                     F.col("p.policy").alias("policy"),
                     F.when((F.col("nt") >= F.col("p.min_tokens"))
                            & (F.col("n_stop") * 100
                               >= F.col("p.min_stop_pct") * F.col("nt"))
                            & (F.col("n_uniq") * 100
                               >= F.col("p.min_uniq_pct") * F.col("nt")),
                            1).otherwise(0).alias("keep")))
    return (sweep.groupBy("policy")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("keep").cast("bigint").alias("n_kept"),
                 F.sum(F.col("keep") * F.col("nt")).cast("bigint")
                 .alias("kept_tokens"),
                 F.expr("(1000000 * sum(keep)) div count(*)")
                 .cast("bigint").alias("survival_ppm")))


# ---------------------------------------------------------------------------
# Cohort repeat curve (round 12): for each acquisition cohort (quarter
# of the customer's FIRST order), the share of the cohort that comes
# back for a 2nd, 3rd, ... order — the classic repeat-purchase decay
# curve next to the migration matrix's state view. Exact integers
# end-to-end; the only data-scale shuffle is the per-customer
# aggregate, the k-explode is bounded (<=8 rows per customer), and
# cohort sizes join back as a broadcast.
# ---------------------------------------------------------------------------

_REPEAT_MAX_K = 8


@register(
    "orders_cohort_repeat_curve",
    oracle=f"""
    WITH c AS (
        SELECT o_custkey,
               CAST(MIN(date_part('year', CAST(o_orderdate AS TIMESTAMP)) * 4
                        + (date_part('month', CAST(o_orderdate AS TIMESTAMP))
                           - 1) // 3) AS INTEGER) AS cohort_q,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey
    ),
    k AS (
        SELECT cohort_q,
               UNNEST(range(1, LEAST(n_orders, {_REPEAT_MAX_K}) + 1))
                   AS order_k
        FROM c
    ),
    sz AS (SELECT cohort_q, COUNT(*) AS n_cust FROM c GROUP BY 1)
    SELECT k.cohort_q, CAST(order_k AS INTEGER) AS order_k,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST((1000000 * COUNT(*)) // MAX(sz.n_cust) AS BIGINT)
               AS share_ppm
    FROM k JOIN sz ON sz.cohort_q = k.cohort_q
    GROUP BY k.cohort_q, order_k
    """,
    doc="repeat-purchase decay by acquisition cohort: cohort = quarter "
        "of first order (min of a monotone quarter index), customers "
        "reaching >= k orders for k=1..8 as exact counts and ppm of "
        "cohort size; one customer aggregate + bounded k-explode + "
        "broadcast cohort sizes",
)
def orders_cohort_repeat_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    qidx = (F.year("o_orderdate") * 4
            + ((F.month("o_orderdate") - 1) / 3).cast("int"))
    c = (orders.groupBy("o_custkey")
         .agg(F.min(qidx).cast("int").alias("cohort_q"),
              F.count(F.lit(1)).alias("n_orders")))
    k = c.select(
        "cohort_q",
        F.explode(F.sequence(
            F.lit(1), F.least(F.col("n_orders"), F.lit(_REPEAT_MAX_K))))
        .alias("order_k"))
    sz = c.groupBy("cohort_q").agg(F.count(F.lit(1)).alias("n_cust"))
    return (k.groupBy("cohort_q", F.col("order_k").cast("int")
                      .alias("order_k"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
            .join(F.broadcast(sz), "cohort_q")
            .select("cohort_q", "order_k", "n_customers",
                    F.expr("(1000000 * n_customers) div n_cust")
                    .cast("bigint").alias("share_ppm")))
