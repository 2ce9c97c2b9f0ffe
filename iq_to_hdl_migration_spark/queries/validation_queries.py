"""Validation / reconciliation operators V1-V10 as registered queries
(SURVEY §2.9). V1's transactional verify-or-rollback lives in the
migrate spine (pipeline/migrate.py, fault-injection tested); the
queries here are the ledger/file/report reconciliations — shared-SQL
over the catalog fixture so both engines run the identical body.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iq_to_hdl_migration_spark.catalog.fixture import (
    duckdb_with_prefix, ensure_catalog_views)
from iq_to_hdl_migration_spark.queries import register
from iq_to_hdl_migration_spark.sources.tables import load_table


def _shared(name: str, tables: list[str], body: str, doc: str) -> None:
    oracle = duckdb_with_prefix(tables) + body

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_catalog_views(spark)
        return spark.sql(body)

    fn.__name__ = name
    register(name, oracle=oracle, doc=doc)(fn)


_shared("v1_rowcount_reconciliation", ["extract_ledger", "load_ledger"], """
SELECT e.owner_table,
       CAST(e.rowcount AS BIGINT) AS extracted_rows,
       CAST(l.rowcount AS BIGINT) AS loaded_rows,
       CASE WHEN l.rowcount = e.rowcount THEN 'ok'
            ELSE 'MISMATCH' END AS verdict
FROM extract_ledger e
JOIN load_ledger l ON l.owner_table = e.owner_table
""", "V1/V2 source-vs-target rowcount reconciliation "
     "(migration.py:1461-1480; load_table.sh:36-47) — the in-flight "
     "verify-or-rollback variant is fault-injection tested in "
     "tests/test_migrate_pipeline.py")

_shared("v3_extract_completeness",
        ["systable", "sysuser", "sysiqtab", "extract_ledger"], """
SELECT u.user_name || '.' || t.table_name AS owner_table,
       'not extracted' AS issue
FROM systable t
JOIN sysuser u ON u.user_id = t.creator
JOIN sysiqtab q ON q.table_id = t.table_id
WHERE t.table_type = 'BASE' AND t.server_type = 'IQ' AND q.is_rlv = 'F'
  AND u.user_name IN ('app1', 'app2')
  AND u.user_name || '.' || t.table_name NOT IN
      (SELECT owner_table FROM extract_ledger)
""", "V3 extract completeness anti-join (migration.py:2647-2693)")

_shared("v4_load_completeness", ["extract_ledger", "load_ledger"], """
SELECT e.owner_table, 'extracted but not loaded' AS issue
FROM extract_ledger e
WHERE e.owner_table NOT IN (SELECT owner_table FROM load_ledger)
""", "V4 load completeness anti-join (load_schema_and_data.py:776-820)")

_shared("v5_ledger_integrity",
        ["systable", "sysuser", "sysiqtab", "extract_ledger",
         "load_ledger"], """
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM systable t
        JOIN sysuser u ON u.user_id = t.creator
        JOIN sysiqtab q ON q.table_id = t.table_id
        WHERE t.table_type = 'BASE' AND t.server_type = 'IQ'
          AND q.is_rlv = 'F' AND u.user_name IN ('app1', 'app2'))
           AS n_inventory,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM extract_ledger) AS n_extracted,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM load_ledger) AS n_loaded,
       CASE WHEN (SELECT COUNT(*) FROM extract_ledger) =
                 (SELECT COUNT(*) FROM load_ledger)
            THEN 'ok' ELSE 'INCOMPLETE' END AS verdict
""", "V5 ledger-vs-catalog integrity counts (migration.py:1788-1846)")

_shared("v6_file_copy_validation", ["local_files", "remote_files"], """
SELECT COALESCE(l.path, r.path) AS path,
       CAST(l.size_bytes AS BIGINT) AS local_size,
       CAST(r.size_bytes AS BIGINT) AS remote_size,
       CASE WHEN l.path IS NULL THEN 'extra_remote'
            WHEN r.path IS NULL THEN 'missing_remote'
            WHEN l.size_bytes != r.size_bytes THEN 'size_mismatch'
            ELSE 'ok' END AS status
FROM local_files l
FULL OUTER JOIN remote_files r ON r.path = l.path
""", "V6 file-level copy validation: count+size reconciliation "
     "(load_schema_and_data.py:342-406; copy_data_to_hdlfs.sh:60-75)")

_shared("v7_schema_load_errors", ["load_log"], """
SELECT line_no, line FROM load_log
WHERE line LIKE '%Could not%'
""", "V7 schema-load health scan (load_schema_and_data.py:314-340)")

_shared("v8_empty_tables", ["table_stats", "systable", "sysuser"], """
SELECT u.user_name || '.' || t.table_name AS owner_table
FROM table_stats s
JOIN systable t ON t.table_id = s.table_id
JOIN sysuser u ON u.user_id = t.creator
WHERE s.row_count = 0
""", "V8 empty-table short-circuit set (migration.py:1921-1931)")

_shared("v9_readonly_guard", ["properties"], """
SELECT name, value,
       CASE WHEN lower(value) IN ('off', 'no', 'n') THEN 'writable'
            ELSE 'read-only' END AS mode
FROM properties WHERE name = 'readonly'
""", "V9 read-only probe analog (migration.py:385-414)")

_shared("v10_preflight_checks", ["properties", "mpx_nodes"], """
SELECT 'version' AS check_name,
       (SELECT value FROM properties WHERE name = 'version') AS observed,
       CASE WHEN (SELECT regexp_extract(value, 'IQ/([0-9]+)', 1)
                  FROM properties WHERE name = 'version') = '16'
            THEN 'ok' ELSE 'FAIL' END AS verdict
UNION ALL
SELECT 'charset' AS check_name,
       (SELECT value FROM properties WHERE name = 'Charset') AS observed,
       CASE WHEN (SELECT value FROM properties WHERE name = 'Charset')
                 IN ('UTF-8', 'UTF8') THEN 'ok' ELSE 'FAIL' END AS verdict
UNION ALL
SELECT 'coordinator' AS check_name,
       (SELECT MIN(server_name) FROM mpx_nodes
        WHERE role = 'coordinator') AS observed,
       CASE WHEN EXISTS (SELECT 1 FROM mpx_nodes
                         WHERE role = 'coordinator'
                           AND status = 'included')
            THEN 'ok' ELSE 'FAIL' END AS verdict
""", "V10 coordinator/version/charset preflight "
     "(migration.py:316-381; common.py:253-260)")


@register(
    "dq_profile_lineitem",
    oracle="""
    SELECT col, CAST(n_null AS BIGINT) AS n_null,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(vmin AS DOUBLE) AS vmin, CAST(vmax AS DOUBLE) AS vmax
    FROM (
        SELECT 'l_quantity' AS col, COUNT(*) - COUNT(l_quantity) AS n_null,
               COUNT(DISTINCT l_quantity) AS n_distinct,
               MIN(l_quantity) AS vmin, MAX(l_quantity) AS vmax
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', COUNT(*) - COUNT(l_extendedprice),
               COUNT(DISTINCT l_extendedprice),
               MIN(l_extendedprice), MAX(l_extendedprice) FROM lineitem
        UNION ALL
        SELECT 'l_discount', COUNT(*) - COUNT(l_discount),
               COUNT(DISTINCT l_discount),
               MIN(l_discount), MAX(l_discount) FROM lineitem
        UNION ALL
        SELECT 'l_tax', COUNT(*) - COUNT(l_tax), COUNT(DISTINCT l_tax),
               MIN(l_tax), MAX(l_tax) FROM lineitem
    ) t
    """,
    doc="single-pass column profiler (null count / distinct / min / max "
        "per column) — the data-quality primitive behind V-suite checks; "
        "Spark computes all columns in ONE scan+aggregate (the oracle's "
        "UNION ALL form rescans per column, which is exactly what this "
        "operator avoids at 100 TB)",
)
def dq_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    aggs = []
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("double")).alias(f"{c}__min"),
            F.max(F.col(c).cast("double")).alias(f"{c}__max"),
        ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__null, {c}__distinct, {c}__min, {c}__max" for c in cols)
    return one.select(F.expr(
        f"stack({len(cols)}, {stack_args}) "
        "AS (col, n_null, n_distinct, vmin, vmax)"))


@register(
    "v11_content_diff_report",
    # deterministic drift twin: keys =3 (mod 97) deleted, =5 repriced,
    # =7 re-added under shifted keys — the oracle enumerates the same
    # drift directly
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           'removed' AS status
    FROM orders WHERE o_orderkey % 97 = 3
    UNION ALL
    SELECT CAST(o_orderkey + 100000000 AS BIGINT), 'added'
    FROM orders WHERE o_orderkey % 97 = 7
    UNION ALL
    SELECT CAST(o_orderkey AS BIGINT), 'changed'
    FROM orders WHERE o_orderkey % 97 = 5
    """,
    doc="content-level diff (beyond V1's row counts): full-outer join "
        "on the key comparing one md5 per side over non-key columns — "
        "same shuffle shape as any fact join (co-locates on bucketed "
        "staging); only disagreeing rows leave the join. Run here "
        "against a deterministic drift twin of orders",
)
def v11_content_diff_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iq_to_hdl_migration_spark.operators.diff import table_diff

    orders = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    survivors = (orders.where(key % 97 != 3)
                 .withColumn("o_totalprice",
                             F.when(key % 97 == 5,
                                    F.col("o_totalprice") + 1.0)
                             .otherwise(F.col("o_totalprice"))))
    readded = (orders.where(key % 97 == 7)
               .withColumn("o_orderkey", key + 100_000_000))
    right = survivors.unionByName(readded)
    return table_diff(orders, right, ["o_orderkey"])


# ---------------------------------------------------------------------------
# referential-integrity audit across every FK edge of the star schema —
# the cross-table complement of dq_profile_lineitem's single-table
# profile (the reference validates per-table row counts,
# migration.py:1940-2049; orphan detection is the natural next check a
# warehouse migration signs off on).  Each edge is a distinct-keys
# left-anti probe: project the child to its key column (column-pruned
# scan), distinct it (map-side partial), anti-join the parent key set —
# broadcast when the parent is a dim.  Orphan counts land alongside
# child cardinalities so a 0-orphan row still carries non-trivial
# evidence.
# ---------------------------------------------------------------------------

_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def _fk_oracle() -> str:
    parts = []
    for child, ck, parent, pk in _FK_EDGES:
        parts.append(f"""
        SELECT '{child}.{ck}->{parent}.{pk}' AS fk_edge,
               CAST(COUNT(*) AS BIGINT) AS n_child_rows,
               CAST(COUNT(DISTINCT {ck}) AS BIGINT) AS n_child_keys,
               CAST((SELECT COUNT(*) FROM (
                    SELECT DISTINCT {ck} FROM {child}
                    WHERE {ck} IS NOT NULL
                      AND {ck} NOT IN (SELECT {pk} FROM {parent})) o)
                    AS BIGINT) AS n_orphan_keys
        FROM {child} WHERE {ck} IS NOT NULL""")
    return " UNION ALL ".join(parts)


@register(
    "dq_referential_integrity",
    oracle=_fk_oracle(),
    doc="orphan-key audit over all 7 FK edges of the star schema: child "
        "row/key cardinalities + distinct child keys missing from the "
        "parent; per-edge column-pruned scans, distinct-then-anti-join "
        "(broadcast for dim parents). Beyond-reference V-suite row.",
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for child, ck, parent, pk in _FK_EDGES:
        c = load_table(spark, sf_dir, child).where(F.col(ck).isNotNull())
        p = load_table(spark, sf_dir, parent).select(pk)
        keys = c.select(F.col(ck).alias("k")).distinct()
        orphans = (keys.join(p, keys["k"] == p[pk], "left_anti")
                   .agg(F.count(F.lit(1)).alias("n_orphan_keys")))
        stats = c.agg(
            F.count(F.lit(1)).alias("n_child_rows"),
            F.countDistinct(ck).alias("n_child_keys"))
        row = (stats.join(F.broadcast(orphans))
               .select(F.lit(f"{child}.{ck}->{parent}.{pk}").alias("fk_edge"),
                       "n_child_rows", "n_child_keys", "n_orphan_keys"))
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# dictionary-encoding advisor — the layout-tuning report a columnar
# warehouse runs before deciding per-column encodings (the reference's
# IQ pages have FP/LF index variants chosen by cardinality; SURVEY
# §2.1 sizing analog). Per column: exact cardinality, plain vs
# dictionary size estimates, and a recommend flag. Code width is the
# integer bit-length of (n_distinct - 1) (length(bin(x)) — exact in
# both engines), so the whole report is integer arithmetic.
# ---------------------------------------------------------------------------

_DICT_COLS = [
    # (column, plain bytes per value: fixed for numerics, NULL = use
    # string length)
    ("l_returnflag", None),
    ("l_linestatus", None),
    ("l_orderkey", 8),
    ("l_partkey", 8),
    ("l_suppkey", 8),
    ("l_linenumber", 4),
]


def _dict_advisor_oracle() -> str:
    parts = []
    for col, width in _DICT_COLS:
        if width is None:
            plain = f"CAST(SUM(length(CAST({col} AS VARCHAR))) AS BIGINT)"
            dict_store = (f"(SELECT CAST(SUM(length(CAST(v AS VARCHAR))) "
                          f"AS BIGINT) FROM "
                          f"(SELECT DISTINCT {col} AS v FROM lineitem) d)")
        else:
            plain = f"CAST(COUNT(*) * {width} AS BIGINT)"
            dict_store = (f"(SELECT CAST(COUNT(*) * {width} AS BIGINT) FROM "
                          f"(SELECT DISTINCT {col} AS v FROM lineitem) d)")
        parts.append(f"""
        SELECT '{col}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
               {plain} AS est_plain_bytes,
               {dict_store}
                   + CAST(COUNT(*) AS BIGINT)
                     * ((length(bin(greatest(COUNT(DISTINCT {col}) - 1, 1)))
                         + 7) // 8) AS est_dict_bytes
        FROM lineitem""")
    body = " UNION ALL ".join(parts)
    return f"""
    SELECT column_name, n_rows, n_distinct, est_plain_bytes,
           est_dict_bytes,
           CASE WHEN est_dict_bytes < est_plain_bytes
                THEN 1 ELSE 0 END AS recommend_dict
    FROM ({body}) t
    """


@register(
    "layout_dictionary_advisor",
    oracle=_dict_advisor_oracle(),
    doc="per-column dictionary-encoding advisor over lineitem: exact "
        "cardinality, plain vs dictionary size estimates (integer "
        "bit-length code widths), recommend flag — the encoding-choice "
        "report behind columnar layout tuning; per-column scans are "
        "column-pruned",
)
def layout_dictionary_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = None
    for col, width in _DICT_COLS:
        if width is None:
            plain = F.sum(F.length(F.col(col).cast("string"))).cast("bigint")
            dict_store = (li.select(F.col(col).alias("v")).distinct()
                          .agg(F.sum(F.length(F.col("v").cast("string")))
                               .cast("bigint").alias("ds")))
        else:
            plain = (F.count(F.lit(1)) * width).cast("bigint")
            dict_store = (li.select(F.col(col).alias("v")).distinct()
                          .agg((F.count(F.lit(1)) * width)
                               .cast("bigint").alias("ds")))
        stats = li.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(col).alias("n_distinct"),
            plain.alias("est_plain_bytes"))
        row = (stats.join(F.broadcast(dict_store))
               .select(
                   F.lit(col).alias("column_name"),
                   "n_rows", "n_distinct", "est_plain_bytes",
                   (F.col("ds")
                    + F.col("n_rows")
                    * F.expr("(length(bin(greatest(n_distinct - 1, 1)))"
                             " + 7) div 8")).cast("bigint")
                   .alias("est_dict_bytes")))
        out = row if out is None else out.unionByName(row)
    return out.withColumn(
        "recommend_dict",
        F.when(F.col("est_dict_bytes") < F.col("est_plain_bytes"), 1)
        .otherwise(0))


# ---------------------------------------------------------------------------
# Deletion-propagation (right-to-erasure) audit: given a cohort of
# customers to forget, report exactly how many rows in each dependent
# table the cascade touches BEFORE running the destructive delete —
# the dry-run a compliance pipeline runs against 100 TB.  Pure
# semi-join fan-out along the FK chain (customer -> orders ->
# lineitem): each hop is one shuffle on its join key, the target-key
# set never leaves the cluster, and the counts are map-side partials.

@register(
    "retention_cascade_audit",
    oracle="""
    WITH targets AS (
        SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
    ),
    hit_orders AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM targets)
    )
    SELECT * FROM (
        SELECT 'customer' AS table_name,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM targets)
                   AS n_rows_cascade,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM customer)
                   AS n_rows_total
        UNION ALL
        SELECT 'orders',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM hit_orders),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)
        UNION ALL
        SELECT 'lineitem',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
                WHERE l_orderkey IN (SELECT o_orderkey FROM hit_orders)),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
    )
    """,
    doc="deletion-propagation dry-run: per-table cascade row counts "
        "for a forget-cohort along the customer->orders->lineitem FK "
        "chain — semi-join fan-out, one shuffle per hop, counts only "
        "(no data movement); the compliance precheck before a "
        "destructive delete",
)
def retention_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    targets = cust.where(F.col("c_custkey") % 97 == 0).select("c_custkey")
    hit_orders = orders.join(
        targets, orders["o_custkey"] == targets["c_custkey"],
        "left_semi").select("o_orderkey")
    hit_li = li.join(hit_orders, li["l_orderkey"] == hit_orders["o_orderkey"],
                     "left_semi")

    def row(name: str, cascade: DataFrame, total: DataFrame) -> DataFrame:
        c = cascade.agg(F.count(F.lit(1)).alias("n_rows_cascade"))
        t = total.agg(F.count(F.lit(1)).alias("n_rows_total"))
        return (c.crossJoin(F.broadcast(t))
                .select(F.lit(name).alias("table_name"),
                        "n_rows_cascade", "n_rows_total"))

    return (row("customer", targets, cust)
            .union(row("orders", hit_orders, orders))
            .union(row("lineitem", hit_li, li)))


# ---------------------------------------------------------------------------
# Snapshot drift report: the monitoring query a production pipeline
# runs between two ingests — did the value distribution move?  Two
# date-sliced snapshots of orders are binned on a fixed price grid
# (fixed bins, not quantiles, so the report is mergeable and two
# engines agree bit-for-bit); per bin the report carries exact counts,
# shares, share drift, and a chi-square-style contribution
# ((sa-sb)^2/(sa+sb)) whose division chain is engine-portable.  Two
# map-side-combined aggregations, one tiny (10-row) join — no state
# that grows with data volume.

_DRIFT_BIN_W = 50_000
_DRIFT_NBINS = 10
_DRIFT_SPLIT = "1998-01-01"


@register(
    "drift_snapshot_report",
    oracle=f"""
    WITH a AS (
        SELECT least(CAST(floor(o_totalprice / {_DRIFT_BIN_W}) AS BIGINT),
                     {_DRIFT_NBINS - 1}) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_a
        FROM orders WHERE o_orderdate < DATE '{_DRIFT_SPLIT}'
        GROUP BY 1
    ),
    b AS (
        SELECT least(CAST(floor(o_totalprice / {_DRIFT_BIN_W}) AS BIGINT),
                     {_DRIFT_NBINS - 1}) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_b
        FROM orders WHERE o_orderdate >= DATE '{_DRIFT_SPLIT}'
        GROUP BY 1
    ),
    tot AS (
        SELECT (SELECT SUM(n_a) FROM a) AS ta,
               (SELECT SUM(n_b) FROM b) AS tb
    )
    SELECT COALESCE(a.bin, b.bin) AS bin,
           COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b,
           CAST(COALESCE(n_a, 0) AS DOUBLE) / CAST(ta AS DOUBLE)
               AS share_a,
           CAST(COALESCE(n_b, 0) AS DOUBLE) / CAST(tb AS DOUBLE)
               AS share_b,
           (CAST(COALESCE(n_a, 0) AS DOUBLE) / CAST(ta AS DOUBLE))
             - (CAST(COALESCE(n_b, 0) AS DOUBLE) / CAST(tb AS DOUBLE))
               AS share_drift,
           CASE WHEN COALESCE(n_a, 0) + COALESCE(n_b, 0) = 0 THEN 0.0
                ELSE ((CAST(COALESCE(n_a, 0) AS DOUBLE)
                           / CAST(ta AS DOUBLE))
                      - (CAST(COALESCE(n_b, 0) AS DOUBLE)
                           / CAST(tb AS DOUBLE)))
                     * ((CAST(COALESCE(n_a, 0) AS DOUBLE)
                             / CAST(ta AS DOUBLE))
                        - (CAST(COALESCE(n_b, 0) AS DOUBLE)
                             / CAST(tb AS DOUBLE)))
                     / ((CAST(COALESCE(n_a, 0) AS DOUBLE)
                             / CAST(ta AS DOUBLE))
                        + (CAST(COALESCE(n_b, 0) AS DOUBLE)
                             / CAST(tb AS DOUBLE)))
           END AS chi2_contrib
    FROM a FULL JOIN b ON a.bin = b.bin, tot
    """,
    doc="snapshot drift monitor: two date-sliced order snapshots on a "
        "fixed price grid — exact per-bin counts, shares, drift, and "
        "a portable chi-square-style contribution; fixed bins keep "
        "the report mergeable and engine-agreeing (quantile bins "
        "would not be)",
)
def drift_snapshot_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    binned = orders.select(
        F.least(F.expr(f"CAST(floor(o_totalprice / {_DRIFT_BIN_W}) AS BIGINT)"),
                F.lit(_DRIFT_NBINS - 1)).alias("bin"),
        F.col("o_orderdate"))
    a = (binned.where(F.col("o_orderdate") < F.lit(_DRIFT_SPLIT))
         .groupBy("bin").agg(F.count(F.lit(1)).alias("n_a")))
    b = (binned.where(F.col("o_orderdate") >= F.lit(_DRIFT_SPLIT))
         .groupBy("bin").agg(F.count(F.lit(1)).alias("n_b")))
    ta = a.agg(F.sum("n_a").alias("ta"))
    tb = b.agg(F.sum("n_b").alias("tb"))
    j = (a.join(b, "bin", "full")
         .select("bin",
                 F.coalesce("n_a", F.lit(0)).alias("n_a"),
                 F.coalesce("n_b", F.lit(0)).alias("n_b"))
         .crossJoin(F.broadcast(ta.crossJoin(tb))))
    sa = F.col("n_a").cast("double") / F.col("ta").cast("double")
    sb = F.col("n_b").cast("double") / F.col("tb").cast("double")
    return j.select(
        "bin", "n_a", "n_b",
        sa.alias("share_a"), sb.alias("share_b"),
        (sa - sb).alias("share_drift"),
        F.when(F.col("n_a") + F.col("n_b") == 0, F.lit(0.0))
        .otherwise((sa - sb) * (sa - sb) / (sa + sb))
        .alias("chi2_contrib"))


@register(
    "drift_ks_statistic",
    oracle=f"""
    WITH a AS (
        SELECT least(CAST(floor(o_totalprice / {_DRIFT_BIN_W}) AS BIGINT),
                     {_DRIFT_NBINS - 1}) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_a
        FROM orders WHERE o_orderdate < DATE '{_DRIFT_SPLIT}'
        GROUP BY 1
    ),
    b AS (
        SELECT least(CAST(floor(o_totalprice / {_DRIFT_BIN_W}) AS BIGINT),
                     {_DRIFT_NBINS - 1}) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_b
        FROM orders WHERE o_orderdate >= DATE '{_DRIFT_SPLIT}'
        GROUP BY 1
    ),
    grid AS (
        SELECT COALESCE(a.bin, b.bin) AS bin,
               COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
        FROM a FULL JOIN b ON a.bin = b.bin
    ),
    cum AS (
        SELECT bin,
               SUM(n_a) OVER (ORDER BY bin) AS ca,
               SUM(n_b) OVER (ORDER BY bin) AS cb,
               (SELECT SUM(n_a) FROM grid) AS ta,
               (SELECT SUM(n_b) FROM grid) AS tb
        FROM grid
    ),
    dev AS (
        SELECT bin,
               abs(CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE)
                   - CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE)) AS d
        FROM cum
    )
    SELECT CAST(ta AS BIGINT) AS n_a_total,
           CAST(tb AS BIGINT) AS n_b_total,
           (SELECT MAX(d) FROM dev) AS ks_stat,
           (SELECT CAST(MIN(bin) AS BIGINT) FROM dev
            WHERE d = (SELECT MAX(d) FROM dev)) AS ks_bin
    FROM cum LIMIT 1
    """,
    doc="Kolmogorov-Smirnov drift summary on the same fixed grid as "
        "drift_snapshot_report: max |cumulative-share gap| between the "
        "two snapshots plus the bin where it peaks — cumulative INTEGER "
        "counts with one division each, so even the KS statistic "
        "value-hash-matches",
)
def drift_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    binned = orders.select(
        F.least(F.expr(f"CAST(floor(o_totalprice / {_DRIFT_BIN_W}) "
                       "AS BIGINT)"),
                F.lit(_DRIFT_NBINS - 1)).alias("bin"),
        F.col("o_orderdate"))
    a = (binned.where(F.col("o_orderdate") < F.lit(_DRIFT_SPLIT))
         .groupBy("bin").agg(F.count(F.lit(1)).alias("n_a")))
    b = (binned.where(F.col("o_orderdate") >= F.lit(_DRIFT_SPLIT))
         .groupBy("bin").agg(F.count(F.lit(1)).alias("n_b")))
    grid = (a.join(b, "bin", "full")
            .select("bin",
                    F.coalesce("n_a", F.lit(0)).alias("n_a"),
                    F.coalesce("n_b", F.lit(0)).alias("n_b")))
    # the grid is <= _DRIFT_NBINS rows — a single-partition cumulative
    # window over it is a 10-row sort, not a data-volume hazard
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = (grid
           .withColumn("ca", F.sum("n_a").over(w))
           .withColumn("cb", F.sum("n_b").over(w))
           .withColumn("ta", F.sum("n_a").over(wall))
           .withColumn("tb", F.sum("n_b").over(wall)))
    dev = cum.select(
        "bin", "ta", "tb",
        F.abs(F.col("ca").cast("double") / F.col("ta").cast("double")
              - F.col("cb").cast("double") / F.col("tb").cast("double"))
        .alias("d"))
    return (dev.agg(
        F.max("ta").cast("bigint").alias("n_a_total"),
        F.max("tb").cast("bigint").alias("n_b_total"),
        F.max("d").alias("ks_stat"),
        F.min_by("bin", F.struct(F.negate(F.col("d")), F.col("bin")))
        .cast("bigint").alias("ks_bin")))


@register(
    "dq_freshness_report",
    oracle="""
    WITH t AS (
        SELECT 'orders' AS table_name,
               epoch_us(MAX(CAST(o_orderdate AS TIMESTAMP))) AS max_ts_us,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM orders
        UNION ALL
        SELECT 'lineitem',
               epoch_us(MAX(CAST(l_shipdate AS TIMESTAMP))),
               CAST(COUNT(*) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'events',
               epoch_us(MAX(CAST(ts AS TIMESTAMP))),
               CAST(COUNT(*) AS BIGINT)
        FROM events
    )
    SELECT table_name, max_ts_us, n_rows,
           (SELECT MAX(max_ts_us) FROM t) - max_ts_us
               AS staleness_us,
           max_ts_us = (SELECT MAX(max_ts_us) FROM t) AS is_freshest
    FROM t
    """,
    doc="ingest freshness report: per time-bearing table the max "
        "timestamp, row count, and staleness relative to the freshest "
        "table (a deterministic reference — no wall clock) — the "
        "monitoring row a load scheduler checks before kicking "
        "downstream jobs; three map-side-combined aggregates",
)
def dq_freshness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    def leg(name: str, df: DataFrame, col: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.unix_micros(F.max(F.col(col).cast("timestamp")))
            .alias("max_ts_us"),
            F.count(F.lit(1)).alias("n_rows"))

    t = (leg("orders", orders, "o_orderdate")
         .union(leg("lineitem", li, "l_shipdate"))
         .union(leg("events", ev, "ts")))
    top = t.agg(F.max("max_ts_us").alias("freshest_us"))
    return (t.crossJoin(F.broadcast(top))
            .select("table_name", "max_ts_us", "n_rows",
                    (F.col("freshest_us") - F.col("max_ts_us"))
                    .alias("staleness_us"),
                    (F.col("max_ts_us") == F.col("freshest_us"))
                    .alias("is_freshest")))


# ---------------------------------------------------------------------------
# Benford first-digit conformance over order totals — a classic
# data-quality / fraud screen for financial fact columns.  Expected
# frequencies log10(1+1/d) are pre-scaled integer constants
# (parts-per-million, floor — identical literals in both engines), so
# observed-vs-expected deviation is pure BIGINT algebra; each digit's
# chi-square contribution is a short double mult/div chain on two
# int64-backed doubles (bit-stable), never a cross-row double sum.
# 100 TB shape: one map-side-combined groupBy on a 9-value key; the
# output is always exactly 9 rows.

_BENFORD_PPM = {1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
                6: 66946, 7: 57991, 8: 51152, 9: 45757}
_BENFORD_CASE = ("CASE digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items()) + " END")


@register(
    "dq_benford_first_digit",
    oracle=f"""
    WITH obs AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS digit,
               CAST(COUNT(*) AS BIGINT) AS observed
        FROM orders GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM obs)
    SELECT obs.digit, obs.observed,
           CAST({_BENFORD_CASE} AS BIGINT) AS expected_ppm,
           CAST(obs.observed * 1000000 - tot.n * {_BENFORD_CASE}
                AS BIGINT) AS dev_ppm,
           (CAST(obs.observed * 1000000 - tot.n * {_BENFORD_CASE}
                 AS DOUBLE) / 1000000.0)
           * (CAST(obs.observed * 1000000 - tot.n * {_BENFORD_CASE}
                   AS DOUBLE) / 1000000.0)
           / (CAST(tot.n * {_BENFORD_CASE} AS DOUBLE) / 1000000.0)
               AS chi2_contrib
    FROM obs, tot ORDER BY obs.digit
    """,
    doc="Benford first-digit screen on o_totalprice: integer ppm "
        "expected-frequency constants, BIGINT deviation, per-digit "
        "chi-square contribution as a bit-stable double chain; one "
        "9-key map-side-combined aggregation at any scale",
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # materialize the 9-row digit histogram once: obs feeds both the
    # output and the total, and without this the plan scans orders 3x
    obs = (orders.select(
        F.expr("CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)"
               " AS STRING), 1, 1) AS BIGINT)").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("observed"))
        .localCheckpoint())
    tot = obs.agg(F.sum("observed").cast("bigint").alias("n"))
    j = obs.crossJoin(F.broadcast(tot)).withColumn(
        "expected_ppm", F.expr(_BENFORD_CASE).cast("bigint"))
    dev = (F.col("observed") * 1000000
           - F.col("n") * F.col("expected_ppm")).cast("bigint")
    dev_d = dev.cast("double") / F.lit(1000000.0)
    exp_d = ((F.col("n") * F.col("expected_ppm")).cast("double")
             / F.lit(1000000.0))
    return (j.select("digit", "observed", "expected_ppm",
                     dev.alias("dev_ppm"),
                     (dev_d * dev_d / exp_d).alias("chi2_contrib"))
            .orderBy("digit"))


# ---------------------------------------------------------------------------
# Primary-key uniqueness audit across every table — the standard
# warehouse DQ row beside referential integrity: per table, row count
# vs distinct-PK count and the duplicate surplus (0 everywhere on a
# healthy corpus; a nonzero row is the first thing an ingest
# regression shows). Composite keys hash through the portable md5
# idiom so the distinct is one shuffle of 16-byte digests per table.

_PK_COLS = {
    "region": ["r_regionkey"], "nation": ["n_nationkey"],
    "customer": ["c_custkey"], "supplier": ["s_suppkey"],
    "part": ["p_partkey"], "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"], "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _pk_uniqueness_oracle() -> str:
    parts = []
    for t, cols in _PK_COLS.items():
        key = ("md5(" + " || '|' || ".join(
            f"CAST({c} AS VARCHAR)" for c in cols) + ")")
        parts.append(f"""
        SELECT '{t}' AS table_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT {key}) AS BIGINT) AS n_distinct_pk,
               CAST(COUNT(*) - COUNT(DISTINCT {key}) AS BIGINT)
                   AS n_dup_rows
        FROM {t}""")
    return " UNION ALL ".join(parts)


@register(
    "dq_pk_uniqueness_audit",
    oracle=_pk_uniqueness_oracle(),
    doc="primary-key uniqueness audit over all 10 tables: rows vs "
        "distinct PKs and the duplicate surplus per table; composite "
        "keys digest through md5 so each table costs one 16-byte-key "
        "distinct — the ingest-regression tripwire beside "
        "dq_referential_integrity",
)
def dq_pk_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for t, cols in _PK_COLS.items():
        df = load_table(spark, sf_dir, t)
        key = F.md5(F.concat_ws(
            "|", *[F.col(c).cast("string") for c in cols]).cast("binary"))
        row = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct(key).cast("bigint").alias("n_distinct_pk")
        ).select(F.lit(t).alias("table_name"), "n_rows", "n_distinct_pk",
                 (F.col("n_rows") - F.col("n_distinct_pk")).cast("bigint")
                 .alias("n_dup_rows"))
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "dq_mad_outlier_docs",
    oracle="""
    WITH med AS (
        SELECT source, quantile_cont(n_chars, 0.5) AS med_chars
        FROM documents GROUP BY source
    ),
    dev AS (
        SELECT d.source, m.med_chars,
               abs(d.n_chars - m.med_chars) AS adev
        FROM documents d JOIN med m USING (source)
    ),
    mad AS (
        SELECT source, quantile_cont(adev, 0.5) AS mad_chars
        FROM dev GROUP BY source
    )
    SELECT v.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MAX(v.med_chars) AS median_chars,
           MAX(m.mad_chars) AS mad_chars,
           CAST(SUM(CASE WHEN v.adev > 5 * m.mad_chars
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev v JOIN mad m USING (source)
    GROUP BY v.source
    """,
    doc="robust per-source length outlier audit: median + MAD (median "
        "absolute deviation) of n_chars, flagging docs beyond 5 MAD — "
        "the mean/stddev-free twin of the z-score audits, immune to "
        "the very outliers it hunts. Two exact-percentile passes, each "
        "one shuffle on source; deviations are exact binary halves so "
        "every float is bit-stable cross-engine. Per-source medians "
        "and MADs are source-count-bounded, so both join sides "
        "broadcast at any corpus size.",
)
def dq_mad_outlier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("double").alias("x"))
    med = docs.groupBy("source").agg(
        F.expr("percentile(x, 0.5D)").alias("med_chars"))
    dev = (docs.join(F.broadcast(med), "source")
           .withColumn("adev", F.abs(F.col("x") - F.col("med_chars"))))
    mad = dev.groupBy("source").agg(
        F.expr("percentile(adev, 0.5D)").alias("mad_chars"))
    return (dev.join(F.broadcast(mad), "source")
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.max("med_chars").alias("median_chars"),
                 F.max("mad_chars").alias("mad_chars"),
                 F.sum(F.when(F.col("adev") > 5 * F.col("mad_chars"),
                              1).otherwise(0)).cast("bigint")
                 .alias("n_outliers")))


# ---------------------------------------------------------------------------
# Robust moment audit: 5% two-sided winsorized and trimmed means of
# the event value per type. Complements dq_mad_outlier_docs (median/
# MAD location) with robust SPREAD-aware means — the pair a data-
# quality gate uses to decide whether heavy tails are real signal or
# ingest garbage. Values are 1e6-floor-quantized to BIGINT first so
# sums are exact integers in any order (a double SUM would be
# partition-order-dependent and hash-unstable); cut ranks are integer
# arithmetic; every emitted double is one shared division chain.
# Windows partition by event_type — distributed at any scale.
# ---------------------------------------------------------------------------

_WIN_PCT = 5  # two-sided trim/winsorize percentage


@register(
    "dq_winsorized_value_stats",
    oracle=f"""
    WITH q AS (
        SELECT event_type, event_id,
               CAST(FLOOR(value * 1000000.0) AS BIGINT) AS qv
        FROM events
    ),
    r AS (
        SELECT event_type, qv,
               CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY qv, event_id)
                    AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY event_type)
                    AS BIGINT) AS n
        FROM q
    ),
    cuts AS (
        SELECT event_type, n,
               n * {_WIN_PCT} // 100 + 1 AS lo_rank,
               n - n * {_WIN_PCT} // 100 AS hi_rank
        FROM r GROUP BY event_type, n
    ),
    bounded AS (
        SELECT r.event_type, r.qv, r.rn, c.n, c.lo_rank, c.hi_rank,
               MAX(CASE WHEN r.rn = c.lo_rank THEN r.qv END)
                   OVER (PARTITION BY r.event_type) AS lo_qv,
               MAX(CASE WHEN r.rn = c.hi_rank THEN r.qv END)
                   OVER (PARTITION BY r.event_type) AS hi_qv
        FROM r JOIN cuts c USING (event_type)
    )
    SELECT event_type, MAX(n) AS n_events,
           CAST(MAX(lo_qv) AS DOUBLE) / 1000000.0 AS lo_cut,
           CAST(MAX(hi_qv) AS DOUBLE) / 1000000.0 AS hi_cut,
           CAST(SUM(CASE WHEN rn >= lo_rank AND rn <= hi_rank
                         THEN qv ELSE 0 END) AS DOUBLE)
               / CAST(SUM(CASE WHEN rn >= lo_rank AND rn <= hi_rank
                               THEN 1 ELSE 0 END) AS DOUBLE)
               / 1000000.0 AS trimmed_mean,
           CAST(SUM(CASE WHEN qv < lo_qv THEN lo_qv
                         WHEN qv > hi_qv THEN hi_qv
                         ELSE qv END) AS DOUBLE)
               / CAST(MAX(n) AS DOUBLE) / 1000000.0 AS winsorized_mean,
           CAST(SUM(CASE WHEN qv < lo_qv THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clamped_lo,
           CAST(SUM(CASE WHEN qv > hi_qv THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clamped_hi
    FROM bounded
    GROUP BY event_type
    """,
    doc="robust per-type value moments: 5% two-sided trimmed and "
        "winsorized means over 1e6-quantized integer values (exact "
        "order statistics by (value, event_id) rank; integer sums -> "
        "one shared division chain, so every double is bit-stable), "
        "plus the cut values and clamp counts — the heavy-tail "
        "data-quality audit",
)
def dq_winsorized_value_stats(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    q = ev.select("event_type", "event_id",
                  F.floor(F.col("value") * F.lit(1e6)).cast("bigint")
                  .alias("qv"))
    wr = Window.partitionBy("event_type").orderBy("qv", "event_id")
    wp = Window.partitionBy("event_type")
    r = (q.withColumn("rn", F.row_number().over(wr).cast("bigint"))
         .withColumn("n", F.count(F.lit(1)).over(wp).cast("bigint"))
         .withColumn("lo_rank",
                     F.expr(f"n * {_WIN_PCT} div 100 + 1"))
         .withColumn("hi_rank",
                     F.expr(f"n - n * {_WIN_PCT} div 100")))
    bounded = (r.withColumn(
        "lo_qv", F.max(F.when(F.col("rn") == F.col("lo_rank"),
                              F.col("qv"))).over(wp))
        .withColumn(
        "hi_qv", F.max(F.when(F.col("rn") == F.col("hi_rank"),
                              F.col("qv"))).over(wp)))
    in_trim = (F.col("rn") >= F.col("lo_rank")) & \
              (F.col("rn") <= F.col("hi_rank"))
    wins = (F.when(F.col("qv") < F.col("lo_qv"), F.col("lo_qv"))
            .when(F.col("qv") > F.col("hi_qv"), F.col("hi_qv"))
            .otherwise(F.col("qv")))
    return (bounded.groupBy("event_type")
            .agg(F.max("n").alias("n_events"),
                 (F.max("lo_qv").cast("double") / F.lit(1e6))
                 .alias("lo_cut"),
                 (F.max("hi_qv").cast("double") / F.lit(1e6))
                 .alias("hi_cut"),
                 (F.sum(F.when(in_trim, F.col("qv")).otherwise(0))
                  .cast("double")
                  / F.sum(F.when(in_trim, 1).otherwise(0)).cast("double")
                  / F.lit(1e6)).alias("trimmed_mean"),
                 (F.sum(wins).cast("double")
                  / F.max("n").cast("double") / F.lit(1e6))
                 .alias("winsorized_mean"),
                 F.sum(F.when(F.col("qv") < F.col("lo_qv"), 1)
                       .otherwise(0)).cast("bigint").alias("n_clamped_lo"),
                 F.sum(F.when(F.col("qv") > F.col("hi_qv"), 1)
                       .otherwise(0)).cast("bigint")
                 .alias("n_clamped_hi")))


# ---------------------------------------------------------------------------
# Documents schema-contract audit: the DQ pass a corpus ingest runs
# before anything downstream trusts the table — null/blank text,
# malformed language tags, and the n_chars==length(text) cross-field
# invariant, per source. One scan, map-only predicates, rates as
# single divisions; violations never leave the aggregate, so the
# report is a fixed-size frame at any corpus size.
# ---------------------------------------------------------------------------


@register(
    "dq_documents_contract",
    oracle=r"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN text IS NULL OR trim(text) = ''
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_blank_text,
           CAST(SUM(CASE WHEN lang IS NULL
                              OR NOT regexp_matches(lang, '^[a-z]{2}$')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_lang,
           CAST(SUM(CASE WHEN n_chars IS NULL OR n_chars != len(text)
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_chars_mismatch,
           CAST(SUM(CASE WHEN text IS NOT NULL AND trim(text) != ''
                          AND lang IS NOT NULL
                          AND regexp_matches(lang, '^[a-z]{2}$')
                          AND n_chars = len(text)
                         THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS pass_rate
    FROM documents
    GROUP BY source
    """,
    doc="documents schema-contract audit per source: blank/null text, "
        "malformed ISO-639-ish lang tags, and the n_chars==length(text) "
        "cross-field invariant, with an all-rules pass rate — the "
        "ingest-gate DQ report (V-family analog for the corpus table); "
        "one map-only scan, fixed-size output",
)
def dq_documents_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    blank = F.col("text").isNull() | (F.trim(F.col("text")) == "")
    bad_lang = (F.col("lang").isNull()
                | ~F.col("lang").rlike("^[a-z]{2}$"))
    mismatch = (F.col("n_chars").isNull()
                | (F.col("n_chars") != F.length("text")))
    ok = ~blank & ~bad_lang & (F.col("n_chars") == F.length("text"))
    return (docs.groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum(F.when(blank, 1).otherwise(0)).cast("bigint")
                 .alias("n_blank_text"),
                 F.sum(F.when(bad_lang, 1).otherwise(0)).cast("bigint")
                 .alias("n_bad_lang"),
                 F.sum(F.when(mismatch, 1).otherwise(0)).cast("bigint")
                 .alias("n_chars_mismatch"),
                 (F.sum(F.when(ok, 1).otherwise(0)).cast("double")
                  / F.count(F.lit(1)).cast("double")).alias("pass_rate")))


# ---------------------------------------------------------------------------
# Order-total reconciliation: does o_totalprice equal the order's
# lineitem-derived charge sum? The warehouse-migration validation that
# goes beyond row counts (V1) to VALUES — and on this synthetic corpus
# it honestly reports systematic drift rather than a vacuous pass.
# Portability discipline: the per-line charge is one double multiply
# chain (identical op order both engines), quantized to BIGINT
# 10^-4 units BEFORE summing (double sums are engine-order-dependent;
# integer sums are not); gaps are integer ppm.
# ---------------------------------------------------------------------------


@register(
    "dq_order_total_reconciliation",
    oracle="""
    WITH l AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                   * (1 + l_tax) * 10000) AS BIGINT))
                    AS BIGINT) AS s_q
        FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
        SELECT o.o_orderstatus AS status,
               CAST(FLOOR(o.o_totalprice * 10000) AS BIGINT) AS t_q,
               l.s_q
        FROM orders o LEFT JOIN l ON l.l_orderkey = o.o_orderkey
    ),
    g AS (
        SELECT status, (s_q IS NULL) AS no_lines,
               CASE WHEN s_q IS NULL THEN 0
                    ELSE abs(t_q - s_q) * 1000000
                         // greatest(t_q, 1) END AS gap_ppm
        FROM j
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN no_lines THEN 1 ELSE 0 END) AS BIGINT)
               AS n_without_lines,
           CAST(SUM(CASE WHEN NOT no_lines AND gap_ppm <= 10000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_within_1pct,
           CAST(MAX(gap_ppm) AS BIGINT) AS max_gap_ppm,
           CAST(SUM(gap_ppm) AS BIGINT) AS sum_gap_ppm,
           CAST(SUM(gap_ppm) AS DOUBLE)
               / CAST(SUM(CASE WHEN no_lines THEN 0 ELSE 1 END) AS DOUBLE)
               AS mean_gap_ppm
    FROM g GROUP BY status
    """,
    doc="order-total VALUE reconciliation per status: o_totalprice vs "
        "the lineitem charge sum (extendedprice*(1-disc)*(1+tax)), "
        "quantized to BIGINT 1e-4 units before summing so the compare "
        "is engine-order-independent; reports line-less orders, "
        "within-1%% matches, and integer-ppm gap stats — the V-family "
        "taken from row counts to values",
)
def dq_order_total_reconciliation(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lsum = (li.select(
        "l_orderkey",
        F.expr("CAST(FLOOR(l_extendedprice * (1 - l_discount) "
               "* (1 + l_tax) * 10000) AS BIGINT)").alias("q"))
        .groupBy("l_orderkey")
        .agg(F.sum("q").cast("bigint").alias("s_q")))
    j = (orders.select(
            F.col("o_orderstatus").alias("status"),
            F.expr("CAST(FLOOR(o_totalprice * 10000) AS BIGINT)")
            .alias("t_q"), "o_orderkey")
         .join(lsum.withColumnRenamed("l_orderkey", "o_orderkey"),
               "o_orderkey", "left"))
    no_lines = F.col("s_q").isNull()
    gap_ppm = F.when(no_lines, F.lit(0)).otherwise(
        F.expr("abs(t_q - s_q) * 1000000 div greatest(t_q, 1L)"))
    g = j.select("status", no_lines.alias("no_lines"),
                 gap_ppm.alias("gap_ppm"))
    return (g.groupBy("status")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                 F.sum(F.when(F.col("no_lines"), 1).otherwise(0))
                 .cast("bigint").alias("n_without_lines"),
                 F.sum(F.when(~F.col("no_lines")
                              & (F.col("gap_ppm") <= 10000), 1)
                       .otherwise(0)).cast("bigint")
                 .alias("n_within_1pct"),
                 F.max("gap_ppm").cast("bigint").alias("max_gap_ppm"),
                 F.sum("gap_ppm").cast("bigint").alias("sum_gap_ppm"),
                 (F.sum("gap_ppm").cast("double")
                  / F.sum(F.when(F.col("no_lines"), 0).otherwise(1))
                  .cast("double")).alias("mean_gap_ppm")))


# ---------------------------------------------------------------------------
# Functional-dependency audit: data-profiling primitive behind both the
# migration assessment (a column pair that LOOKS like an FD but isn't
# cannot become a lookup table / normalized dimension) and layout
# advice (an exact FD's RHS is a dictionary-encodable dependent
# column). Each candidate X → Y is one groupBy(X) with an exact
# distinct-count of Y — the violating-group census, not the violating
# ROWS (row lists scale with data; the census is bounded by the FD
# list). All four probes shuffle once on their LHS and reduce to one
# row each; the report is their 4-row union.
# ---------------------------------------------------------------------------

_FD_PROBES = [
    # (fd_name, table, lhs, rhs) — two that genuinely fail in TPC-H
    # shaped data, one that holds by PK, one that fails mildly
    ("lineitem.l_orderkey->l_returnflag", "lineitem",
     "l_orderkey", "l_returnflag"),
    ("lineitem.l_partkey->l_suppkey", "lineitem",
     "l_partkey", "l_suppkey"),
    ("orders.o_custkey->o_orderpriority", "orders",
     "o_custkey", "o_orderpriority"),
    ("orders.o_orderkey->o_custkey", "orders",
     "o_orderkey", "o_custkey"),
]


def _fd_oracle() -> str:
    blocks = []
    for fd_name, table, lhs, rhs in _FD_PROBES:
        blocks.append(f"""
    SELECT '{fd_name}' AS fd,
           CAST(COUNT(*) AS BIGINT) AS n_lhs_groups,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_groups,
           CAST(MAX(nd) AS BIGINT) AS max_rhs_variants,
           CAST((1000000 * SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS violation_ppm
    FROM (SELECT {lhs}, CAST(COUNT(DISTINCT {rhs}) AS BIGINT) AS nd
          FROM {table} GROUP BY {lhs}) g""")
    return " UNION ALL ".join(blocks)


@register(
    "dq_functional_dependency_audit",
    oracle=_fd_oracle(),
    doc="functional-dependency audit over candidate X→Y pairs: exact "
        "violating-group census (groups, worst variant count, integer "
        "violation ppm) per candidate — the profiling primitive behind "
        "normalize-into-dimension and dictionary-layout decisions; "
        "census not row-list, so output is bounded by the FD list, "
        "one LHS shuffle per probe",
)
def dq_functional_dependency_audit(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    out = None
    for fd_name, table, lhs, rhs in _FD_PROBES:
        t = load_table(spark, sf_dir, table)
        g = (t.groupBy(lhs)
             .agg(F.countDistinct(rhs).cast("bigint").alias("nd")))
        viol = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).cast("bigint")
        row = g.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lhs_groups"),
            viol.alias("n_violating_groups"),
            F.max("nd").cast("bigint").alias("max_rhs_variants"),
        ).select(
            F.lit(fd_name).alias("fd"),
            "n_lhs_groups", "n_violating_groups", "max_rhs_variants",
            F.expr("(1000000 * n_violating_groups) div n_lhs_groups")
            .cast("bigint").alias("violation_ppm"))
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# k-anonymity audit: privacy-engineering primitive for a release
# gate — under a quasi-identifier tuple (here: nation, market
# segment, order-count band), how many customers sit in equivalence
# classes smaller than k? A class of size 1 is a re-identification;
# sizes 2–4 are linkage-risky. The report is the class-SIZE histogram
# (bounded domain) plus the risky-mass census per k ∈ {2, 5, 10} —
# never the risky ROWS (which would scale with data and itself leak).
# Scale shape: one custkey shuffle for the order counts, one QI-tuple
# shuffle for the classes, then a histogram groupBy over the bounded
# class-size domain. Integer-exact throughout.
# ---------------------------------------------------------------------------

@register(
    "dq_k_anonymity_audit",
    oracle="""
    WITH oc AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_custkey
    ),
    qi AS (
        SELECT c_nationkey AS nation, c_mktsegment AS segment,
               CAST(COALESCE(n_orders, 0) // 5 AS INTEGER) AS order_band,
               c_custkey
        FROM customer LEFT JOIN oc ON c_custkey = o_custkey
    ),
    classes AS (
        SELECT nation, segment, order_band,
               CAST(COUNT(*) AS BIGINT) AS class_size
        FROM qi GROUP BY nation, segment, order_band
    )
    SELECT class_size,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(class_size) AS BIGINT) AS n_customers,
           CAST(CASE WHEN class_size < 2 THEN SUM(class_size)
                     ELSE 0 END AS BIGINT) AS below_k2,
           CAST(CASE WHEN class_size < 5 THEN SUM(class_size)
                     ELSE 0 END AS BIGINT) AS below_k5,
           CAST(CASE WHEN class_size < 10 THEN SUM(class_size)
                     ELSE 0 END AS BIGINT) AS below_k10
    FROM classes GROUP BY class_size
    """,
    doc="k-anonymity audit over the (nation, segment, order-count "
        "band) quasi-identifier: equivalence-class-size histogram "
        "with the re-identifiable / linkage-risky customer mass per "
        "k ∈ {2,5,10} — a census over the bounded class-size domain, "
        "never the risky rows; two shuffles, integer-exact",
)
def dq_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    oc = (orders.groupBy("o_custkey")
          .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders")))
    qi = (cust.join(oc, cust.c_custkey == oc.o_custkey, "left")
          .select(F.col("c_nationkey").alias("nation"),
                  F.col("c_mktsegment").alias("segment"),
                  F.expr("CAST(coalesce(n_orders, 0) div 5 AS INT)")
                  .alias("order_band")))
    classes = (qi.groupBy("nation", "segment", "order_band")
               .agg(F.count(F.lit(1)).cast("bigint").alias("class_size")))
    g = (classes.groupBy("class_size")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n_classes"),
              F.sum("class_size").cast("bigint").alias("n_customers")))
    return g.select(
        "class_size", "n_classes", "n_customers",
        F.when(F.col("class_size") < 2, F.col("n_customers"))
        .otherwise(0).cast("bigint").alias("below_k2"),
        F.when(F.col("class_size") < 5, F.col("n_customers"))
        .otherwise(0).cast("bigint").alias("below_k5"),
        F.when(F.col("class_size") < 10, F.col("n_customers"))
        .otherwise(0).cast("bigint").alias("below_k10"))


# ---------------------------------------------------------------------------
# Partition-key advisor: the layout decision a 100 TB migration makes
# exactly once and lives with — for each candidate partition key, the
# partition count, the row skew (hottest partition vs the mean, in
# ppm), and the small-partition fraction. A key with few giant
# partitions starves parallelism; one with thousands of near-empty
# partitions drowns the planner in file listings. Each probe is one
# groupBy on its key and one second-level aggregate over the bounded
# partition spine; integer-exact (skew_ppm = 1e6·max·n/total).
# ---------------------------------------------------------------------------

_PART_PROBES = [
    # (candidate, table, key expression — Spark and DuckDB dialects)
    ("orders.month(o_orderdate)", "orders",
     "date_trunc('month', o_orderdate)",
     "date_trunc('month', o_orderdate)"),
    ("orders.o_orderpriority", "orders",
     "o_orderpriority", "o_orderpriority"),
    ("customer.c_nationkey", "customer",
     "c_nationkey", "c_nationkey"),
    ("lineitem.month(l_shipdate)", "lineitem",
     "date_trunc('month', l_shipdate)",
     "date_trunc('month', l_shipdate)"),
]


def _partition_advisor_oracle() -> str:
    blocks = []
    for cand, table, _spark_k, duck_k in _PART_PROBES:
        blocks.append(f"""
    SELECT candidate, n_partitions, total_rows, max_rows, min_rows,
           skew_ppm, n_tiny
    FROM (
        WITH g AS (SELECT {duck_k} AS k, CAST(COUNT(*) AS BIGINT) AS n
                   FROM {table} GROUP BY 1),
        a AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_partitions,
                   CAST(SUM(n) AS BIGINT) AS total_rows,
                   CAST(MAX(n) AS BIGINT) AS max_rows,
                   CAST(MIN(n) AS BIGINT) AS min_rows
            FROM g
        ),
        tiny AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_tiny
            FROM g, a WHERE n * 20 < total_rows // n_partitions + 1
        )
        SELECT '{cand}' AS candidate, n_partitions, total_rows,
               max_rows, min_rows,
               CAST((1000000 * max_rows * n_partitions) // total_rows
                    AS BIGINT) AS skew_ppm,
               n_tiny
        FROM a, tiny
    ) t""")
    return " UNION ALL ".join(blocks)


@register(
    "layout_partition_key_advisor",
    oracle=_partition_advisor_oracle(),
    doc="partition-key advisor: per candidate key the partition count, "
        "hottest-partition skew in ppm, and tiny-partition census "
        "(below 5% of the mean) — the one-time physical-layout "
        "decision table; one groupBy per probe over its key, second "
        "aggregate over the bounded partition spine",
)
def layout_partition_key_advisor(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    out = None
    for cand, table, spark_k, _duck_k in _PART_PROBES:
        t = load_table(spark, sf_dir, table)
        g = (t.groupBy(F.expr(spark_k).alias("k"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
        a = g.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
            F.sum("n").cast("bigint").alias("total_rows"),
            F.max("n").cast("bigint").alias("max_rows"),
            F.min("n").cast("bigint").alias("min_rows"))
        tiny = (g.crossJoin(F.broadcast(a.select(
                    F.expr("total_rows div n_partitions + 1")
                    .alias("mean_hi"))))
                .where(F.col("n") * 20 < F.col("mean_hi"))
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_tiny")))
        out_row = a.crossJoin(F.broadcast(tiny)).select(
            F.lit(cand).alias("candidate"),
            "n_partitions", "total_rows", "max_rows", "min_rows",
            F.expr("(1000000 * max_rows * n_partitions) div total_rows")
            .cast("bigint").alias("skew_ppm"),
            "n_tiny")
        out = out_row if out is None else out.unionByName(out_row)
    return out


# ---------------------------------------------------------------------------
# Id-continuity audit: surrogate keys in ingested fact tables are
# expected to be dense — a hole in the id span means an upstream
# extractor dropped rows (the failure V1 row counts can't localize:
# counts can match while DIFFERENT rows are missing), and duplicate
# ids mean a replayed partition. One aggregate per probe: rows,
# distinct ids, span, and the derived missing/duplicate mass —
# integer-exact, output bounded by the probe list.
# ---------------------------------------------------------------------------

_ID_PROBES = [
    ("events.event_id", "events", "event_id"),
    ("orders.o_orderkey", "orders", "o_orderkey"),
    ("documents.doc_id", "documents", "doc_id"),
    ("embeddings.vec_id", "embeddings", "vec_id"),
]


def _id_continuity_oracle() -> str:
    blocks = []
    for probe, table, col in _ID_PROBES:
        blocks.append(f"""
    SELECT '{probe}' AS probe,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_ids,
           CAST(MIN({col}) AS BIGINT) AS min_id,
           CAST(MAX({col}) AS BIGINT) AS max_id,
           CAST(MAX({col}) - MIN({col}) + 1 - COUNT(DISTINCT {col})
                AS BIGINT) AS n_missing,
           CAST(COUNT(*) - COUNT(DISTINCT {col}) AS BIGINT) AS n_dup_ids
    FROM {table}""")
    return " UNION ALL ".join(blocks)


@register(
    "dq_id_continuity_audit",
    oracle=_id_continuity_oracle(),
    doc="surrogate-key continuity audit: holes in the id span localize "
        "extractor row loss that matching row COUNTS cannot (different "
        "rows missing on each side), duplicate ids expose replayed "
        "partitions; one exact aggregate per probe, bounded output",
)
def dq_id_continuity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for probe, table, col in _ID_PROBES:
        t = load_table(spark, sf_dir, table)
        row = t.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct(col).cast("bigint").alias("n_ids"),
            F.min(col).cast("bigint").alias("min_id"),
            F.max(col).cast("bigint").alias("max_id"),
        ).select(
            F.lit(probe).alias("probe"),
            "n_rows", "n_ids", "min_id", "max_id",
            (F.col("max_id") - F.col("min_id") + 1 - F.col("n_ids"))
            .cast("bigint").alias("n_missing"),
            (F.col("n_rows") - F.col("n_ids")).cast("bigint")
            .alias("n_dup_ids"))
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# Cross-field/cross-table consistency audit (round 12): the rule-census
# shape every warehouse runs nightly — N business rules evaluated in a
# SINGLE pass over the fact join, reported as one row per rule. The
# expensive part (lineitem JOIN orders on the orderkey both tables are
# naturally keyed by) happens ONCE for all rules; each rule is a
# conditional sum, and the unpivot to rule rows is a stack() over the
# one aggregated row — no second scan, no per-rule query.
# ---------------------------------------------------------------------------

_CROSS_FIELD_RULES = [
    # (rule name, SQL predicate that marks a VIOLATION — ANSI, runs
    #  verbatim in both engines)
    ("ship_before_order", "l_shipdate < o_orderdate"),
    ("discount_out_of_range", "l_discount < 0 OR l_discount > 0.5"),
    ("nonpositive_price", "l_extendedprice <= 0"),
    ("nonpositive_quantity", "l_quantity <= 0"),
    ("tax_out_of_range", "l_tax < 0 OR l_tax > 0.2"),
    ("orphan_lineitem", "o_orderkey IS NULL"),
]


def _cross_field_oracle() -> str:
    sums = ",\n           ".join(
        f"SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS v{i}"
        for i, (_, pred) in enumerate(_CROSS_FIELD_RULES))
    legs = " UNION ALL ".join(
        f"SELECT '{name}' AS rule, n, v{i} AS v FROM agg"
        for i, (name, _) in enumerate(_CROSS_FIELD_RULES))
    return f"""
    WITH j AS (
        SELECT l.*, o.o_orderkey, o.o_orderdate
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    agg AS (
        SELECT COUNT(*) AS n,
           {sums}
        FROM j
    )
    SELECT rule, CAST(n AS BIGINT) AS n_checked,
           CAST(v AS BIGINT) AS n_violations,
           CAST((1000000 * v) // n AS BIGINT) AS violation_ppm
    FROM ({legs}) t
    """


@register(
    "dq_cross_field_audit",
    oracle=_cross_field_oracle(),
    doc="multi-rule cross-field/cross-table consistency census "
        "(ship-before-order, value ranges, orphan lineitems): all "
        "rules as conditional sums over ONE lineitem-orders join pass, "
        "unpivoted to a rule x (checked, violations, ppm) report — "
        "N rules for the price of one scan",
)
def dq_cross_field_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate")
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left")
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.when(F.expr(pred), 1).otherwise(0)).alias(f"v{i}")
        for i, (_, pred) in enumerate(_CROSS_FIELD_RULES)]
    agg = j.agg(*aggs)
    stack = ", ".join(f"'{name}', v{i}"
                      for i, (name, _) in enumerate(_CROSS_FIELD_RULES))
    return (agg.select(
        F.expr(f"stack({len(_CROSS_FIELD_RULES)}, {stack}) AS (rule, v)"),
        F.col("n"))
        .select("rule", F.col("n").cast("bigint").alias("n_checked"),
                F.col("v").cast("bigint").alias("n_violations"),
                F.expr("(1000000 * v) div n").cast("bigint")
                .alias("violation_ppm")))


# ---------------------------------------------------------------------------
# Warehouse-wide null profile (round 12): dq_profile_lineitem's
# per-column discipline extended to EVERY table in one report — the
# completeness dashboard a 100 TB ingest checks before anything else.
# One aggregate pass per table (conditional sums for all columns at
# once, unpivoted with stack()), unioned across the bounded table
# spine; at cluster scale each leg is one map-side-combined scan.
# The column spine is pinned statically so the Spark report and the
# DuckDB oracle audit the same contract (a schema drift shows up as a
# query error, which is the right failure mode for a contract check).
# ---------------------------------------------------------------------------

_NULL_PROFILE_COLUMNS = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
             "p_retailprice"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    "events": ["event_id", "ts", "user_id", "event_type", "value",
               "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}


def _null_profile_oracle() -> str:
    legs = []
    for t, cols in _NULL_PROFILE_COLUMNS.items():
        sums = ", ".join(
            f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS n{i}"
            for i, c in enumerate(cols))
        unions = " UNION ALL ".join(
            f"SELECT '{t}' AS table_name, '{c}' AS column_name, n, "
            f"n{i} AS n_nulls FROM a_{t}"
            for i, c in enumerate(cols))
        legs.append(
            f"a_{t} AS (SELECT COUNT(*) AS n, {sums} FROM {t})")
        legs.append(f"u_{t} AS ({unions})")
    body = " UNION ALL ".join(
        f"SELECT * FROM u_{t}" for t in _NULL_PROFILE_COLUMNS)
    return ("WITH " + ", ".join(legs)
            + f""" SELECT table_name, column_name,
                 CAST(n AS BIGINT) AS n_rows,
                 CAST(n_nulls AS BIGINT) AS n_nulls,
                 CAST(CASE WHEN n = 0 THEN 0
                      ELSE (1000000 * n_nulls) // n END AS BIGINT)
                     AS null_ppm
          FROM ({body}) t""")


@register(
    "dq_null_profile_all_tables",
    bench=True,
    oracle=_null_profile_oracle(),
    doc="warehouse-wide completeness profile: per (table, column) row "
        "count, null count and null ppm for every table in the star "
        "schema + corpus — one conditional-sum aggregate pass per "
        "table unpivoted via stack(), unioned over the bounded table "
        "spine; the first dashboard a 100 TB ingest gate reads",
)
def dq_null_profile_all_tables(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    out = None
    for t, cols in _NULL_PROFILE_COLUMNS.items():
        df = load_table(spark, sf_dir, t)
        aggs = [F.count(F.lit(1)).alias("n")] + [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .alias(f"n{i}") for i, c in enumerate(cols)]
        agg = df.agg(*aggs)
        stack = ", ".join(f"'{c}', n{i}" for i, c in enumerate(cols))
        leg = (agg.select(
            F.lit(t).alias("table_name"),
            F.expr(f"stack({len(cols)}, {stack}) "
                   "AS (column_name, n_nulls)"),
            F.col("n"))
            .select("table_name", "column_name",
                    F.col("n").cast("bigint").alias("n_rows"),
                    F.col("n_nulls").cast("bigint").alias("n_nulls"),
                    F.expr("CASE WHEN n = 0 THEN 0 "
                           "ELSE (1000000 * n_nulls) div n END")
                    .cast("bigint").alias("null_ppm")))
        out = leg if out is None else out.unionByName(leg)
    return out


@register(
    "dq_date_coverage_by_month",
    oracle="""
    SELECT CAST(date_part('year', CAST(o_orderdate AS DATE)) AS INTEGER)
               AS year,
           CAST(date_part('month', CAST(o_orderdate AS DATE)) AS INTEGER)
               AS month,
           CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT)
               AS n_days_with_orders,
           CAST(MAX(date_part('day',
                    last_day(CAST(o_orderdate AS DATE)))) AS BIGINT)
               AS n_calendar_days,
           CAST((1000000 * COUNT(DISTINCT CAST(o_orderdate AS DATE)))
                // MAX(date_part('day', last_day(CAST(o_orderdate AS DATE))))
                AS BIGINT) AS coverage_ppm,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1, 2
    """,
    doc="calendar-coverage audit: per (year, month), how many distinct "
        "days actually carry orders vs the month's calendar days, as "
        "exact ppm — a silent ingest gap (a dropped day of files) "
        "shows up here before it skews any trend query; one scan, "
        "bounded month-grain groupBy with map-side combine",
)
def dq_date_coverage_by_month(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return (o.groupBy(F.year(d).cast("int").alias("year"),
                      F.month(d).cast("int").alias("month"))
            .agg(F.countDistinct(d).cast("bigint")
                 .alias("n_days_with_orders"),
                 F.max(F.dayofmonth(F.last_day(d))).cast("bigint")
                 .alias("n_calendar_days"),
                 F.count(F.lit(1)).cast("bigint").alias("n_orders"))
            .select("year", "month", "n_days_with_orders",
                    "n_calendar_days",
                    F.expr("(1000000 * n_days_with_orders) "
                           "div n_calendar_days").cast("bigint")
                    .alias("coverage_ppm"),
                    "n_orders"))


# ---------------------------------------------------------------------------
# Numeric-headroom audit (round 14): every money column this engine
# emits rides the BIGINT-cents discipline (the oracle-type lint
# forbids DECIMAL/HUGEINT at top level), and this round's Fano fix
# showed how quietly an integer expression can approach 2^63.  This
# audit measures, per monetary/quantity column, the actual maximum
# |value| in cents and the bits of headroom left below int64 — the
# evidence that the cents contract holds at the current corpus and
# how much scale-up margin remains.  One scan per table with
# conditional aggregates, bounded 8-row output.
# ---------------------------------------------------------------------------

_OVERFLOW_COLS = [
    ("orders", "o_totalprice"),
    ("lineitem", "l_extendedprice"),
    ("lineitem", "l_quantity"),
    ("lineitem", "l_discount"),
    ("lineitem", "l_tax"),
    ("customer", "c_acctbal"),
    ("supplier", "s_acctbal"),
    ("part", "p_retailprice"),
]


def _overflow_oracle() -> str:
    parts = []
    for t, c in _OVERFLOW_COLS:
        parts.append(f"""
    SELECT '{t}' AS table_name, '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MAX(CAST(FLOOR(ABS({c}) * 100) AS BIGINT)) AS BIGINT)
               AS max_abs_cents,
           CAST(63 - length(bin(MAX(CAST(FLOOR(ABS({c}) * 100)
                                         AS BIGINT)))) AS INTEGER)
               AS headroom_bits
    FROM {t}""")
    return " UNION ALL ".join(parts)


@register(
    "dq_numeric_overflow_audit",
    oracle=_overflow_oracle(),
    doc="int64-headroom audit of every monetary/quantity column: max "
        "|value| in exact cents and the bits of headroom below 2^63 "
        "— the standing evidence for the engine-wide BIGINT-cents "
        "contract (scripts/lint_oracle_types.py) and the scale-up "
        "margin it leaves; one conditional-aggregate scan per table, "
        "8-row output",
)
def dq_numeric_overflow_audit(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    out = None
    for t, c in _OVERFLOW_COLS:
        tab = load_table(spark, sf_dir, t)
        mac = F.max(F.floor(F.abs(F.col(c)) * 100).cast("bigint"))
        row = tab.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            mac.cast("bigint").alias("max_abs_cents")).select(
            F.lit(t).alias("table_name"),
            F.lit(c).alias("column_name"),
            "n_rows", "max_abs_cents",
            (F.lit(63) - F.length(F.bin(F.col("max_abs_cents"))))
            .cast("int").alias("headroom_bits"))
        out = row if out is None else out.unionByName(row)
    return out
