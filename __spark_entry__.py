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
    # round 6: scaled_dim broadcast policy touched these
    "q3_shipping_priority", "q5_region_volume", "q9_product_profit",
    "q10_returned_items",
    "q21_sole_return_suppliers", "trade_flow_matrix",
    "nation_trade_balance", "q7_nation_volume", "q8_market_share",
    # (q2/q14/q17/q18/q19/q20 trimmed from the sample: TPC-H shapes
    # that drew green driver rows in r5; the sf0.01 local gate still
    # covers them, and the slots buy first driver rows for round-5/6
    # additions below)
    # (nation_pareto/customer_cadence/supplier_hhi/dense_top3/
    # ship_latency/q16/top_parts/revenue_rank also trimmed: r5-green,
    # only const-dim hints touched)
    "text_contamination_13gram",
    # round 6: rule tables / HLL day_idx / incremental-LSH cap /
    # PPJoin prefix slack
    "s13_hosparams_rules_intersection", "j16_options_rules_intersection",
    "f13_permanent_mpx_options", "sketch_hll_portable_rollup",
    "dedup_incremental_pairs", "dedup_ngram_jaccard_pairs",
    "dedup_minhash_lsh_pairs",
    # round 6 additions
    "stream_incremental_dedup", "sim_ann_multiprobe2_topk",
    "sketch_hll_overlap_matrix", "hybrid_retrieval_rrf",
    "sketch_countmin_heavy_hitters", "join_bloom_prefilter_stats",
    "scd2_user_type_history", "stream_scd2_history",
    "entity_resolution_clusters", "sketch_kmv_join_cardinality",
    "skew_key_diagnostics", "retention_cascade_audit",
    "mlprep_doc_chunks", "mlprep_chunk_dedup_stats",
    "drift_snapshot_report", "text_token_rarity_scores",
    "sample_bottomk_per_lang",
    # round-5 additions without a driver row yet
    "dedup_containment_pairs", "curation_grand_funnel",
    "sim_ivf_fixedpoint_topk", "sim_quantized_topk",
    "sim_quantized_recall", "sim_ann_recall_matrix",
    "graph_user_pagerank_fixedpoint_top20",
    "text_bm25_topk", "text_winnowing_match_pairs",
    "mlprep_packing_assignments", "mlprep_seqlen_percentiles",
    "sample_weighted_priority", "docs_simhash_bit_drift",
    "text_zipf_constancy", "dq_referential_integrity",
    "v11_content_diff_report",
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
