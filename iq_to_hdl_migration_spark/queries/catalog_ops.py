"""Catalog-introspection operators F1-F19 / J1-J16 / A1-A6 (SURVEY §2.2-2.4).

Each operator is ONE SQL body executed by BOTH engines: Spark runs it
over the catalog-fixture temp views; the DuckDB oracle runs the same
body under a `WITH ... AS (VALUES ...)` prefix materializing identical
rows. This keeps the semantics auditable line-by-line against the
reference SQL cited per query.

A few operators are deliberately not shared-SQL:
  * A5 transitive closure — Spark side is the idiomatic iterative
    DataFrame loop (no recursive CTE needed), oracle is a DuckDB
    `WITH RECURSIVE`; semantic parity, different mechanics — exactly
    the Spark-first translation SURVEY §2.4 calls for.
  * A1/A4 run over the data tables (per-sf), not the fixture.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iq_to_hdl_migration_spark.catalog.fixture import (
    duckdb_with_prefix, ensure_catalog_views)
from iq_to_hdl_migration_spark.queries import register
from iq_to_hdl_migration_spark.sources.tables import register_views


def _catalog_sql(name: str, tables: list[str], body: str, doc: str,
                 needs_data: bool = False, bench: bool = False) -> None:
    """Register a shared-SQL catalog operator."""
    oracle = (duckdb_with_prefix(tables) + body) if tables else body

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_catalog_views(spark)
        if needs_data:
            register_views(spark, sf_dir)
        return spark.sql(body)

    fn.__name__ = name
    fn.__doc__ = doc
    register(name, oracle=oracle, doc=doc, bench=bench)(fn)


# --------------------------- F: filters / predicates ------------------------

_catalog_sql("f1_server_properties", ["properties"], """
SELECT name, value FROM properties
WHERE name IN ('servername', 'version', 'dbname')
""", "F1 scalar server properties (common.py:249; migration.py:327,357)")

_catalog_sql("f2_db_property_flags", ["properties"], """
SELECT name, value,
       CASE WHEN lower(value) IN ('on', 'yes', 'y') THEN 'Yes'
            ELSE 'No' END AS enabled
FROM properties
WHERE name IN ('readonly', 'ReplicationEnabled', 'caseSensitive', 'Encryption')
""", "F2 db_property + CASE WHEN (pre_migration.py:201-206,284,300)")

_catalog_sql("f3_mpx_server_count", ["mpx_nodes"], """
SELECT CAST(COUNT(*) AS BIGINT) AS mpx_server_count FROM mpx_nodes
""", "F3 multiplex existence count (common.py:253; migration.py:325)")

_catalog_sql("f4_mpx_active_readers_writers", ["mpx_nodes"], """
SELECT server_name, role, connection_info FROM mpx_nodes
WHERE (status = 'included' AND inc_state = 'active')
  AND (role = 'writer' OR role = 'reader')
""", "F4 AND/OR conjunction (migration.py:331,2558,2568)")

_catalog_sql("f5_user_main_dbspaces", ["dbspaces"], """
SELECT dbspace_name, dbspace_type, usage_pct, total_size FROM dbspaces
WHERE dbspace_type = 'MAIN' AND dbspace_name != 'IQ_SYSTEM_MAIN'
  AND UPPER(dbspace_name) != 'IQ_SYSTEM_TEMP'
""", "F5 inequality + UPPER() (pre_migration.py:105,141-147; migration.py:925)")

_catalog_sql("f6_external_procedures", ["sysprocedure"], """
SELECT CAST(COUNT(*) AS BIGINT) AS n_external_procs FROM sysprocedure
WHERE proc_defn LIKE '%external name%'
""", "F6 LIKE contains (pre_migration.py:336)")

_catalog_sql("f7_reserved_users", ["sysuser"], """
SELECT user_id, user_name FROM sysuser
WHERE user_name = 'saptu' OR user_name = 'sapsupport'
   OR user_name = 'custadmin' OR user_name = 'hdladmin'
   OR user_name = 'DBA'
""", "F7 OR-chain reserved users (pre_migration.py:352,357)")

_catalog_sql("f8_feature_existence_counts",
             ["syscertificate", "sysexternenv", "sysexternenvobject",
              "sysspatialreferencesystem", "syswebservice"], """
SELECT 'certificate' AS feature, CAST(COUNT(*) AS BIGINT) AS n FROM syscertificate
UNION ALL
SELECT 'external_env' AS feature, CAST(COUNT(*) AS BIGINT) AS n FROM sysexternenv
UNION ALL
SELECT 'external_env_object' AS feature, CAST(COUNT(*) AS BIGINT) AS n FROM sysexternenvobject
UNION ALL
SELECT 'spatial_ref_system' AS feature, CAST(COUNT(*) AS BIGINT) AS n FROM sysspatialreferencesystem
UNION ALL
SELECT 'web_service' AS feature, CAST(COUNT(*) AS BIGINT) AS n FROM syswebservice
""", "F8 existence counts (pre_migration.py:373-422,623)")

_catalog_sql("f9_legacy_index_types", ["sysindex"], """
SELECT index_type, CAST(COUNT(*) AS BIGINT) AS n FROM sysindex
WHERE index_type IN ('LD', 'LF', 'HNG')
GROUP BY index_type
""", "F9 LD/LF/HNG index detection (pre_migration.py:454,470,487)")

_catalog_sql("f10_local_segments", ["sysiqfile"], """
SELECT CAST(COUNT(*) AS BIGINT) AS n_local_segments FROM sysiqfile
WHERE segment_type = 'Local'
""", "F10 segment filter (pre_migration.py:503)")

_catalog_sql("f11_user_logical_servers", ["sysiqlogicalserver"], """
SELECT ls_id, ls_name FROM sysiqlogicalserver WHERE ls_id > 10000
""", "F11 range predicate (pre_migration.py:519)")

_catalog_sql("f12_option_prefix_filters", ["sysoption"], """
SELECT option_name, setting FROM sysoption
WHERE (option_name LIKE 'DQP_Enabled%' AND setting = 'ON')
   OR option_name LIKE 'CORE_Options%'
   OR (option_name LIKE 'Temp_Extract_Directory%' AND setting != '')
""", "F12 LIKE prefix + AND (pre_migration.py:535,569,607)")

_catalog_sql("f13_permanent_mpx_options", ["options"], """
SELECT option_name, option_setting FROM options
WHERE option_type = 'Permanent' AND user_name = 'PUBLIC'
  AND (option_name LIKE 'MPX_options%' OR option_name LIKE 'MPX_test_options%')
""", "F13 sp_iqcheckoptions filters (pre_migration.py:659,706,586,591)")

_catalog_sql("f14_remote_server_classes", ["sysserver"], """
SELECT srvname, srvclass,
       CASE WHEN srvclass IN ('aseodbc', 'hanaodbc', 'iqodbc', 'saodbc')
            THEN 'supported' ELSE 'unsupported' END AS support
FROM sysserver
""", "F14 IN-list membership (pre_migration.py:315-323; migration.py:943,870)")

_catalog_sql("f15_sap_internal_users", ["sysuser"], """
SELECT user_id, user_name FROM sysuser
WHERE lower(user_name) LIKE '!_sap!_%' ESCAPE '!'
""", "F15 lower() + LIKE ESCAPE (migration.py:736)")

_catalog_sql("f16_sys_roles", ["sysuserperm"], """
SELECT user_name FROM sysuserperm WHERE user_name LIKE 'SYS_%_ROLE'
""", "F16 LIKE two wildcards (migration.py:962)")

_catalog_sql("f17_string_rtruncation", ["sysoption"], """
SELECT option_name, setting FROM sysoption
WHERE option_name = 'string_rtruncation'
""", "F17 option equality (migration.py:1497,2111,2312)")

_catalog_sql("f18_migratable_tables", ["systable", "sysuser"], """
SELECT user_name || '.' || table_name AS owner_table, table_id
FROM systable JOIN sysuser ON user_id = creator
WHERE table_type NOT LIKE '%GBL TEMP%' AND server_type = 'IQ'
  AND lower(user_name) != 'dbo' AND lower(user_name) != 'hdladmin'
  AND lower(user_name) NOT LIKE '!_sap!_%' ESCAPE '!'
""", "F18 5-predicate master filter (migration.py:1691,1797)")

_catalog_sql("f19_identity_defaults", ["syscolumn"], """
SELECT table_id, column_name, col_default FROM syscolumn
WHERE col_default IN ('Identity/Autoincrement', 'autoincrement')
""", "F19 identity detection (migration.py:1501-1507,1581-1587,2316-2322)")


# --------------------------------- J: joins --------------------------------

_catalog_sql("j1_tables_by_owner", ["systable", "sysuser"], """
SELECT user_name, table_name FROM systable
JOIN sysuser ON user_id = creator
WHERE user_name NOT IN ('SYS', 'rs_systabgroup', 'SA_DEBUG', 'dbo')
""", "J1 SYSTABLE⋈SYSUSER (migration.py:651,931; pre_migration.py:438)")

_catalog_sql("j2_rlv_tables", ["systable", "sysiqtab"], """
SELECT t.table_id, t.table_name FROM systable t
JOIN sysiqtab q ON t.table_id = q.table_id
WHERE q.is_rlv = 'T'
""", "J2 RLV flag join (pre_migration.py:240; migration.py:968)")

_catalog_sql("j3_master_inventory",
             ["systable", "sysuser", "sysiqtab", "table_stats"], """
SELECT u.user_name || '.' || t.table_name AS owner_table, t.table_id,
       s.row_count, s.size_bytes
FROM systable t
JOIN sysuser u ON u.user_id = t.creator
JOIN sysiqtab q ON q.table_id = t.table_id
LEFT JOIN table_stats s ON s.table_id = t.table_id
WHERE t.table_type NOT LIKE '%GBL TEMP%' AND t.server_type = 'IQ'
  AND q.is_rlv = 'F'
  AND lower(u.user_name) != 'dbo' AND lower(u.user_name) != 'hdladmin'
  AND lower(u.user_name) NOT LIKE '!_sap!_%' ESCAPE '!'
""", "J3 3-way master inventory + stats (migration.py:1691,1797)")

_catalog_sql("j4_table_columns",
             ["syscolumn", "systable", "sysuser", "sysdomain"], """
SELECT c.column_id, c.column_name, d.domain_name, c.width, c.nulls
FROM syscolumn c
JOIN systable t ON t.table_id = c.table_id
JOIN sysuser u ON u.user_id = t.creator
JOIN sysdomain d ON d.domain_id = c.domain_id
WHERE u.user_name = 'app1' AND t.table_name = 't_child'
""", "J4 per-table column metadata (migration.py:1520,1600,2185,2491)")

_catalog_sql("j5_lob_columns",
             ["sysdomain", "syscolumn", "systable", "sysuser"], """
SELECT u.user_name, t.table_name, c.column_name, d.domain_name
FROM sysdomain d
JOIN syscolumn c ON c.domain_id = d.domain_id
JOIN systable t ON t.table_id = c.table_id
JOIN sysuser u ON u.user_id = t.creator
WHERE d.domain_name = 'long varchar' OR d.domain_name = 'long binary'
""", "J5 4-way LOB detection (migration.py:2115-2118,2251,2281)")

_catalog_sql("j6_table_indexes", ["sysindex", "systable", "sysuser"], """
SELECT u.user_name, t.table_name, i.index_name, i.index_type
FROM sysindex i
JOIN systable t ON t.table_id = i.table_id
JOIN sysuser u ON u.user_id = t.creator
""", "J6 one join replaces per-table loop (migration.py:663,758)")

_catalog_sql("j7_table_triggers", ["systrigger", "systable", "sysuser"], """
SELECT g.trigger_name, t.table_name, u.user_name
FROM systrigger g
JOIN systable t ON t.table_id = g.table_id
JOIN sysuser u ON u.user_id = t.creator
""", "J7 triggers (migration.py:669,762,711,804)")

_catalog_sql("j8_view_dependencies", ["sysdependency", "systable"], """
SELECT t.table_name AS ref_name, v.table_name AS dep_name
FROM sysdependency d
JOIN systable t ON t.object_id = d.ref_object_id
JOIN systable v ON v.object_id = d.dep_object_id
""", "J8 double self-join on SYSTABLE (migration.py:677,768,844)")

_catalog_sql("j9_user_procedures", ["sysprocedure", "sysuser"], """
SELECT p.proc_name, u.user_name
FROM sysprocedure p JOIN sysuser u ON u.user_id = p.creator
WHERE p.proc_name NOT LIKE 'sp!_%' ESCAPE '!'
  AND p.proc_name NOT LIKE 'sa!_%' ESCAPE '!'
""", "J9 procedures by creator + NOT LIKE (migration.py:701,793)")

_catalog_sql("j10_remote_procedures", ["sysprocedure", "sysserver"], """
SELECT p.proc_name, s.srvname
FROM sysprocedure p JOIN sysserver s ON s.srvid = p.srvid
""", "J10 remote objects (migration.py:821,829)")

_catalog_sql("j11_proxy_tables", ["systable", "sysproxytab", "sysserver"], """
SELECT t.table_name, s.srvname, s.srvclass
FROM systable t
JOIN sysproxytab x ON x.table_object_id = t.object_id
JOIN sysserver s ON s.srvid = x.srvid
""", "J11 KEY JOIN as explicit equi-join (migration.py:876)")

_catalog_sql("j12_server_capabilities",
             ["sysserver", "syscapability", "syscapabilityname"], """
SELECT s.srvname, CAST(COUNT(*) AS BIGINT) AS n_caps
FROM sysserver s
JOIN syscapability c ON c.srvid = s.srvid
JOIN syscapabilityname n ON n.capid = c.capid
GROUP BY s.srvname
""", "J12 capability 3-way + GROUP BY (migration.py:951,957)")

_catalog_sql("j13_login_policy_options",
             ["sysloginpolicy", "sysloginpolicyoption"], """
SELECT lp.login_policy_name, o.login_option_name, o.login_option_value
FROM sysloginpolicy lp
JOIN sysloginpolicyoption o ON o.login_policy_id = lp.login_policy_id
WHERE lp.login_policy_name NOT IN ('root')
  AND o.login_option_name = 'default_logical_server'
""", "J13 login policy + NOT IN (migration.py:974)")

_catalog_sql("j14_fk_table_count", ["systable", "sysforeignkey"], """
SELECT CAST(COUNT(DISTINCT t.table_id) AS BIGINT) AS n_fk_tables
FROM systable t
JOIN sysforeignkey f ON t.table_id = f.foreign_table_id
WHERE t.server_type = 'IQ'
""", "J14 FK existence (migration.py:1319,1709)")

_catalog_sql("j15_resume_delta",
             ["systable", "sysuser", "sysiqtab", "extract_ledger"], """
SELECT u.user_name || '.' || t.table_name AS owner_table
FROM systable t
JOIN sysuser u ON u.user_id = t.creator
JOIN sysiqtab q ON q.table_id = t.table_id
WHERE t.table_type = 'BASE' AND t.server_type = 'IQ' AND q.is_rlv = 'F'
  AND u.user_name IN ('app1', 'app2')
  AND u.user_name || '.' || t.table_name NOT IN
      (SELECT owner_table FROM extract_ledger)
""", "J15 anti-join resume delta (migration.py:1977,2675,3079) — Catalyst "
     "plans NOT IN as left-anti")

_catalog_sql("j16_options_rules_intersection", ["options", "dbopts_rules"], """
SELECT DISTINCT o.option_name
FROM options o
WHERE o.option_name IN (SELECT option_name FROM dbopts_rules)
""", "J16 semi-join options∩rules (pre_migration.py:669,717) — planned as "
     "left-semi")

_catalog_sql("s13_hosparams_rules_intersection",
             ["options", "hosparams_rules"], """
SELECT DISTINCT o.option_name
FROM options o
WHERE o.option_type = 'Permanent'
  AND o.option_name IN (SELECT option_name FROM hosparams_rules)
""", "S13 IQ-server-options check: Permanent options ∩ the packaged "
     "hosparams_noncustomer.csv rule table (pre_migration.py:686-723, "
     "sp_iqcheckoptions Option_type='Permanent') — left-semi like J16")


# ------------------------------ A: aggregations -----------------------------

_catalog_sql("a1_table_rowcounts", [], """
SELECT 'region' AS table_name, CAST(COUNT(*) AS BIGINT) AS n FROM region
UNION ALL SELECT 'nation' AS table_name, CAST(COUNT(*) AS BIGINT) AS n FROM nation
UNION ALL SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n FROM customer
UNION ALL SELECT 'supplier' AS table_name, CAST(COUNT(*) AS BIGINT) AS n FROM supplier
UNION ALL SELECT 'part' AS table_name, CAST(COUNT(*) AS BIGINT) AS n FROM part
UNION ALL SELECT 'orders' AS table_name, CAST(COUNT(*) AS BIGINT) AS n FROM orders
UNION ALL SELECT 'lineitem' AS table_name, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
UNION ALL SELECT 'events' AS table_name, CAST(COUNT(*) AS BIGINT) AS n FROM events
UNION ALL SELECT 'documents' AS table_name, CAST(COUNT(*) AS BIGINT) AS n FROM documents
UNION ALL SELECT 'embeddings' AS table_name, CAST(COUNT(*) AS BIGINT) AS n FROM embeddings
""", "A1 per-table COUNT(*) inventory pass (migration.py:1699)",
             needs_data=True)

_catalog_sql("a2_table_row_widths", ["syscolumn", "systable", "table_stats"], """
SELECT w.table_id, w.table_name, w.row_width,
       CAST(w.row_width * s.row_count AS BIGINT) AS est_bytes
FROM (
    SELECT c.table_id, t.table_name, CAST(SUM(c.width) AS BIGINT) AS row_width
    FROM syscolumn c JOIN systable t ON t.table_id = c.table_id
    GROUP BY c.table_id, t.table_name
) w
LEFT JOIN table_stats s ON s.table_id = w.table_id
""", "A2 one grouped SUM(width) pass replaces per-table loop "
     "(migration.py:1704-1706)")

_catalog_sql("a3_capable_servers", ["sysserver", "syscapability"], """
SELECT DISTINCT s.srvname
FROM sysserver s JOIN syscapability c ON c.srvid = s.srvid
""", "A3 GROUP BY/DISTINCT server names (migration.py:957)")

_catalog_sql("a4_verify_rowcount", [], """
SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem
""", "A4 SELECT count(*) INTO verification (migration.py:1472,1513,1593)",
             needs_data=True)


@register(
    "a5_view_transitive_closure",
    oracle=duckdb_with_prefix(
        ["sysdependency", "systable"],
        extra_ctes=["""closure(base_object_id, view_object_id) AS (
    SELECT d.ref_object_id, d.dep_object_id
    FROM sysdependency d
    WHERE d.ref_object_id IN
          (SELECT object_id FROM systable WHERE table_type = 'BASE')
    UNION
    SELECT c.base_object_id, d.dep_object_id
    FROM closure c JOIN sysdependency d ON d.ref_object_id = c.view_object_id
)"""],
        recursive=True,
    ) + """
SELECT b.table_name AS base_table, v.table_name AS dependent_view
FROM closure c
JOIN systable b ON b.object_id = c.base_object_id
JOIN systable v ON v.object_id = c.view_object_id
""",
    doc="A5 transitive view closure: Spark = iterative join loop with "
        "visited-set (migration.py:684-698); oracle = recursive CTE",
)
def a5_view_transitive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_catalog_views(spark)
    deps = spark.table("sysdependency")
    systab = spark.table("systable")
    base_ids = systab.where(F.col("table_type") == "BASE").select("object_id")

    # Seed: edges starting at base tables, keyed by the base object.
    frontier = (
        deps.join(base_ids, deps.ref_object_id == base_ids.object_id)
        .select(F.col("ref_object_id").alias("base_object_id"),
                F.col("dep_object_id").alias("view_object_id"))
    )
    closure = frontier
    # The dependency graph is shallow (view-on-view chains); each step is a
    # broadcast-size join. Cycle-guarded by the exceptAll visited-set —
    # the reference would loop forever on cyclic input (SURVEY §7 hard-part 3).
    for _ in range(20):
        nxt = (
            frontier.join(deps,
                          frontier.view_object_id == deps.ref_object_id)
            .select("base_object_id",
                    F.col("dep_object_id").alias("view_object_id"))
            .exceptAll(closure)
        )
        if nxt.isEmpty():
            break
        closure = closure.unionByName(nxt).distinct()
        frontier = nxt
    b = systab.alias("b")
    v = systab.alias("v")
    return (
        closure.join(b, F.col("b.object_id") == F.col("base_object_id"))
        .join(v, F.col("v.object_id") == F.col("view_object_id"))
        .select(F.col("b.table_name").alias("base_table"),
                F.col("v.table_name").alias("dependent_view"))
        .distinct()
    )


_catalog_sql("a6_max_table_size", ["table_stats"], """
SELECT CAST(MAX(size_bytes) AS BIGINT) AS max_size_bytes,
       CAST(CEIL(CAST(MAX(size_bytes) AS DOUBLE) / 1073741824.0) AS BIGINT)
           AS max_size_gb
FROM table_stats
""", "A6 client-side max + ceil-to-GB (migration.py:2841-2859)")
