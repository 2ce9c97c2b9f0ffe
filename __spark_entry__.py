"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real content lives in ``iq_to_hdl_migration_spark.queries`` — this
file just adapts the registry to the driver's three-function contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from iq_to_hdl_migration_spark.queries import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all()
    return registry["q1_pricing_summary"].fn(spark, SMOKE_SF_DIR)


# The driver samples the FIRST 50 registry entries for its
# correctness report, so ordering is evidence allocation. Front-load
# (a) every query whose code changed this round (the broadcast
# size-gating + rule-table + fixed-point revenue work must re-prove
# hash-green under the driver) and (b) additions from recent rounds
# that have never drawn a driver row. Everything else follows in
# registry order; local tests/test_registry_vs_oracle.py still covers
# all 263 at whatever sf the suite runs.
_SAMPLE_PRIORITY = [
    # round 7, tier 1: the two r6 hash-red rows (HUGEINT oracle casts
    # fixed) — must re-prove green under the driver's own hash
    "graph_user_pagerank_fixedpoint_top20", "mlprep_packing_assignments",
    # round 7, tier 2: code changed this round (window rewrites, bin
    # clamp, memo/workdir fixes, k-means refactor) — regression proof
    "events_conversion_latency_percentiles", "text_bpe_first_merges",
    "sketch_histogram_percentiles", "sketch_histogram_weekly_rollup",
    "stream_incremental_dedup", "dedup_incremental_pairs",
    "sim_ivf_fixedpoint_topk",
    # round 7, tier 3: new this round — first driver rows
    "graph_link_prediction_ra", "text_dsir_importance_weights",
    "trend_spearman_acf_monthly_revenue", "dq_benford_first_digit",
    "sim_ivf_incremental_topk", "stream_dsir_gate",
    "mlprep_dedup_aware_weights", "sketch_kmv_set_ops",
    "mm_scene_cuts", "events_cusum_changepoints",
    "text_pii_redact", "stream_bottomk_sample",
    "graph_triangle_counts", "dedup_semdedup_clusters",
    "snapshot_version_diff", "snapshot_time_travel_audit",
    "sim_pq_adc_topk", "graph_kcore_census",
    "trend_mann_kendall_monthly_revenue",
    # round-6 additions that never drew a driver row (VERDICT item 3)
    "sim_mmr_diversified_topk", "sketch_countmin_weekly_rollup",
    "dq_freshness_report", "trend_theil_sen_monthly_revenue",
    "graph_part_copurchase_communities", "events_path_motifs",
    "scd2_point_in_time_join", "drift_ks_statistic",
    "sim_label_centroid_cosine",
    # never-sampled SURVEY §2 rows: catalog/planning/validation/DDL
    # surface so the reference-parity families carry driver evidence
    "j3_master_inventory", "j8_view_dependencies",
    "a5_view_transitive_closure", "f18_migratable_tables",
    "j13_login_policy_options", "o2_lpt_assignment",
    "v5_ledger_integrity", "v10_preflight_checks", "s7_generated_ddl",
    "fn_scalar_suite", "ddl_output_digest",
    # never-sampled multimodal plumbing
    "mm_binary_features", "mm_content_histogram_neardup",
]


def _ordered() -> dict:
    reg = load_all()
    out = {n: reg[n] for n in _SAMPLE_PRIORITY if n in reg}
    out.update((n, s) for n, s in reg.items() if n not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted ⇒ rows-only check)."""
    return {name: spec.oracle for name, spec in _ordered().items()
            if spec.oracle is not None}
