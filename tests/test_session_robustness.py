"""Hostile-session gate: the driver that imports __spark_entry__ owns
its SparkSession, so registry queries must not depend on the conf our
own factory pins (UTC session timezone, 32 shuffle partitions — ANSI
is deliberately NOT pinned, so the base session runs Spark 4's
default ANSI-on). This runs a representative slice of the registry
under a deliberately different SQL conf via `spark.newSession()`
(shared context, independent conf) and asserts results identical to
the pinned-session run."""

from __future__ import annotations

import pytest

from iq_to_hdl_migration_spark.queries import load_all

REGISTRY = load_all()

# timestamp-sensitive, decimal-heavy, hash/split, integer-div, and
# float-canonicalization shapes — the conf-sensitive surface
_SLICE = [
    "events_hourly_by_type",      # timestamps (session TZ)
    "events_rolling_hour_value",  # range frame over timestamps
    "q1_pricing_summary",         # decimal aggregation
    "split_train_test",           # md5 bucketing
    "mix_temperature_sampling",   # div, floor, sqrt fixed-point
    "mlprep_seqlen_percentiles",  # integer rank arithmetic
    "dedup_exact_stats",          # digest distinct
    "sim_quantized_recall",       # integer cosine + join
    "sim_ivf_fixedpoint_topk",    # integer Lloyd iterations
    "sample_weighted_priority",   # md5-uniform priorities + TakeOrdered
    # round-7 shapes
    "text_dsir_importance_weights",   # md5 buckets + rational weight
    "sketch_kmv_set_ops",             # sketch merge + double chains
    "events_cusum_changepoints",      # ts grain + aggregate() fold
    "dedup_semdedup_clusters",        # applyInPandas GEMM under ANSI
    "mm_scene_cuts",                  # mapInPandas numpy histograms
    # round-8 shapes
    "orders_market_basket_lift",      # lift doubles + TakeOrdered ties
    "rag_context_packing",            # cosine doubles + budget cutoff
    "dq_mad_outlier_docs",            # two percentile passes
    # round-9 shapes
    "mlprep_token_budget_selection",  # 2^20 density bins + div under ANSI
    "dq_winsorized_value_stats",      # quantized order stats + int div
    "mlprep_curriculum_interleave",   # percentile boundaries + windows
    "events_funnel_dropoff_time",     # ts micros gaps + 0.9 percentile
    "text_bigram_pmi_topk",           # rational PMI + TakeOrdered ties
    "events_uplift_by_segment",       # md5 split + sqrt z under ANSI
    # round-9 shapes, full enrollment (r9 advice #6)
    "graph_khop_reach",               # BFS layers + localCheckpoint
    "graph_community_modularity",     # rational Q over memoized labels
    "dedup_jaccard_calibration",      # LSH bands + exact-Jaccard div
    "text_boilerplate_ngrams",        # shingle df join + ratio doubles
    "mm_frame_dedup_crossvideo",      # binary sha fingerprints + buckets
    "sim_embedding_drift_report",     # ppm chi-square integer bins
    "sim_embedding_outlier_report",   # MAD order stats on doubles
    "events_sequential_patterns",     # first-occurrence micros ordering
    "curation_filter_attrition",      # rule cascade + kill attribution
    "stream_ab_test",                 # micro-batch fold + md5 split
    "stream_boilerplate_gate",        # frozen shingle index + fold
    # round-10 shapes
    "text_dup_ngram_chars",           # gram tf + ratio doubles
    "text_token_drift_report",        # ppm integer div + TakeOrdered
    "events_poweruser_gini",          # closed-form rank sums + div
    "stream_user_gini",               # additive count fold + gini tail
    "graph_degree_assortativity",     # integer sums + shared double expr
    "sim_cosine_range_search",        # integer cosine threshold
    "mlprep_dataset_card",            # distinct digests + lang mode
    "events_session_overlap_pairs",   # ts sessionize + bucket join
    "events_interarrival_dispersion", # integer gap sums + shared expr
    "mlprep_fim_spans",               # 60-bit md5 hash spans under ANSI
    "text_vocab_coverage_curve",      # desc histogram window + closed form
    "events_funnel_time_constrained", # ts micros deadlines + divisions
    "dq_documents_contract",          # regex lang rule + cross-field eq
    "sketch_quantile_accuracy_report",  # rank window + double errors
    "sim_centroid_shift_report",      # fixed-point means + BIGINT L1
    "mlprep_pii_mask_plan",           # token-wise rlike + divisions
    "sim_ivf_nprobe_recall_curve",    # shared index + 4 rank legs
    "dedup_lsh_collision_profile",    # band join + positional est
    "dq_order_total_reconciliation",  # quantized sums + ppm div
]

_HOSTILE = {
    "spark.sql.session.timeZone": "Asia/Tokyo",
    # the factory never pins ANSI, and Spark 4's default is ON — so
    # the genuinely hostile variant is ANSI OFF (r10 review caught
    # that "true" here merely restated the base session's mode)
    "spark.sql.ansi.enabled": "false",
    "spark.sql.shuffle.partitions": "5",
}


@pytest.fixture(scope="module")
def hostile(spark):
    s = spark.newSession()
    for k, v in _HOSTILE.items():
        s.conf.set(k, v)
    yield s


@pytest.mark.parametrize("name", _SLICE)
def test_query_is_session_conf_independent(spark, hostile, sf_dir, name):
    base = sorted(tuple(r) for r in
                  REGISTRY[name].fn(spark, sf_dir).collect())
    got = sorted(tuple(r) for r in
                 REGISTRY[name].fn(hostile, sf_dir).collect())
    assert got == base, name
