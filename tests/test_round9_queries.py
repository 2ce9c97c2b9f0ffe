"""Semantic locks for the round-9 queries beyond the oracle equality:
the invariants a reader would assume from the docs, asserted directly
so a refactor that keeps hash parity by accident (both sides wrong
the same way) still can't silently change the contract."""

from __future__ import annotations

import pyspark.sql.functions as F

from iq_to_hdl_migration_spark.queries import load_all
from iq_to_hdl_migration_spark.sources.tables import load_table

REGISTRY = load_all()


def test_budget_selection_respects_and_saturates_budget(spark, sf_dir):
    """The selected set spends <= 25% of corpus tokens, and it is
    MAXIMAL under the greedy order: the next-best unselected document
    would not fit."""
    from iq_to_hdl_migration_spark.queries.mlprep_queries import _TBS_PCT

    sel = REGISTRY["mlprep_token_budget_selection"].fn(spark, sf_dir)
    rows = sel.collect()
    assert rows, "selection is empty"
    docs = load_table(spark, sf_dir, "documents")
    toks = r"split(lower(trim(text)), '\\s+')"
    d = docs.select(
        F.col("doc_id"),
        F.size(F.expr(toks)).cast("bigint").alias("nt"),
        F.size(F.array_distinct(F.expr(toks))).cast("bigint").alias("nd"))
    all_rows = {r.doc_id: r for r in d.where(F.col("nt") > 0).collect()}
    budget = sum(r.nt for r in all_rows.values()) * _TBS_PCT // 100
    spent = sum(r.nt for r in rows)
    assert spent <= budget, (spent, budget)
    picked = {r.doc_id for r in rows}
    # greedy order: (floor(density * 2^20) desc, doc_id asc)
    order = sorted(
        all_rows.values(),
        key=lambda r: (-(r.nd * 1048576 // r.nt
                         if (r.nd / r.nt * 1048576.0).is_integer()
                         else int(r.nd / r.nt * 1048576.0)), r.doc_id))
    for r in order:
        if r.doc_id in picked:
            continue
        assert spent + r.nt > budget, (
            f"doc {r.doc_id} (nt={r.nt}) was skipped but fits: "
            f"{spent} + {r.nt} <= {budget}")
        break  # only the FIRST unselected doc in greedy order matters


def test_curriculum_is_a_permutation_with_balanced_deciles(spark, sf_dir):
    out = REGISTRY["mlprep_curriculum_interleave"].fn(spark, sf_dir)
    rows = out.collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs, "not a permutation"
    assert {r.decile for r in rows} <= set(range(10))
    # monotone: higher deciles never hold shorter docs than lower ones
    max_by_dec: dict = {}
    min_by_dec: dict = {}
    for r in rows:
        max_by_dec[r.decile] = max(max_by_dec.get(r.decile, 0), r.n_tokens)
        min_by_dec[r.decile] = min(min_by_dec.get(r.decile, 1 << 60),
                                   r.n_tokens)
    decs = sorted(max_by_dec)
    for lo, hi in zip(decs, decs[1:]):
        assert max_by_dec[lo] <= min_by_dec[hi], (
            f"decile {lo} holds a longer doc than decile {hi}'s shortest")
    # waves are contiguous 1..k per (decile, source)
    per = {}
    for r in rows:
        per.setdefault((r.decile, r.source), []).append(r.wave)
    for k, ws in per.items():
        assert sorted(ws) == list(range(1, len(ws) + 1)), k


def test_winsorized_stats_ordering_and_bounds(spark, sf_dir):
    rows = REGISTRY["dq_winsorized_value_stats"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.lo_cut <= r.hi_cut, r
        assert r.lo_cut <= r.trimmed_mean <= r.hi_cut, r
        assert r.lo_cut <= r.winsorized_mean <= r.hi_cut, r
        # 5% two-sided: clamp counts stay under ~5% of n each
        assert r.n_clamped_lo <= r.n_events * 5 // 100, r
        assert r.n_clamped_hi <= r.n_events * 5 // 100, r


def test_modularity_bounds_and_additivity(spark, sf_dir):
    rows = REGISTRY["graph_community_modularity"].fn(spark, sf_dir).collect()
    assert rows
    q = rows[0].q_total
    assert all(r.q_total == q for r in rows), "global Q must be constant"
    assert -0.5 <= q <= 1.0, q
    m = rows[0].n_edges
    for r in rows:
        assert 0 <= r.e_in <= m, r
        # within-community edges contribute 2 degree-endpoints each
        assert r.deg_sum >= 2 * r.e_in, r


def test_jaccard_calibration_buckets_cover_candidates(spark, sf_dir):
    rows = REGISTRY["dedup_jaccard_calibration"].fn(spark, sf_dir).collect()
    assert rows, "no candidate pairs to calibrate at this sf"
    for r in rows:
        assert r.n_pairs > 0
        assert 0.5 <= r.min_est <= r.max_est <= 1.0, r
        assert 0.0 <= r.min_exact <= r.max_exact <= 1.0, r
        # bucket key is floor(20 * (est - exact)) — recheck its bounds
        assert r.err_bucket >= int(20 * (r.min_est - r.max_exact)) - 1, r


def test_boilerplate_rates_well_formed(spark, sf_dir):
    rows = REGISTRY["text_boilerplate_ngrams"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_boiler <= r.n_shingles, r
        assert 0.0 <= r.boiler_rate <= 1.0, r
        assert 0.0 <= r.max_doc_boiler_ratio <= 1.0, r
        assert r.boiler_rate <= r.max_doc_boiler_ratio, (
            "a mean cannot exceed the max")


def test_uplift_segments_partition_the_ab_report(spark, sf_dir):
    """The stratified counts must sum to the corpus-level A/B report's
    counts — same variant split, same conversion rule, no user lost or
    double-counted across segments."""
    seg = REGISTRY["events_uplift_by_segment"].fn(spark, sf_dir).collect()
    tot = REGISTRY["events_ab_test_report"].fn(spark, sf_dir).collect()[0]
    assert len(seg) >= 2, "segmentation collapsed to one stratum"
    assert sum(r.n_a for r in seg) == tot.n_a
    assert sum(r.c_a for r in seg) == tot.c_a
    assert sum(r.n_b for r in seg) == tot.n_b
    assert sum(r.c_b for r in seg) == tot.c_b


def test_funnel_dropoff_consistent_with_counts(spark, sf_dir):
    gaps = {r.stage: r for r in
            REGISTRY["events_funnel_dropoff_time"].fn(spark,
                                                      sf_dir).collect()}
    counts = REGISTRY["events_funnel_counts"].fn(spark, sf_dir).collect()[0]
    assert gaps["view_to_click"].n_users == counts.n_view_click
    assert gaps["click_to_buy"].n_users == counts.n_view_click_buy
    for r in gaps.values():
        assert 0 < r.p50_gap_us <= r.p90_gap_us <= r.max_gap_us, r


def test_sequential_patterns_bounds(spark, sf_dir):
    rows = REGISTRY["events_sequential_patterns"].fn(spark, sf_dir).collect()
    assert rows
    by_pair = {(r.type_a, r.type_b): r for r in rows}
    for (a, b), r in by_pair.items():
        assert a != b
        assert 0 < r.n_ordered <= min(r.n_users_a, r.n_users_b), r
        assert 0.0 < r.confidence <= 1.0, r
        # strict ordering: (a before b) + (b before a) <= users with both
        rev = by_pair.get((b, a))
        if rev is not None:
            assert r.n_ordered + rev.n_ordered <= min(r.n_users_a,
                                                      r.n_users_b) * 2


def test_embedding_outliers_robust_flag(spark, sf_dir):
    rows = REGISTRY["sim_embedding_outlier_report"].fn(spark,
                                                       sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_outliers <= r.n_vecs, r
        assert r.mad_d2 >= 0 and r.med_d2 >= 0, r
        assert r.max_d2 >= r.med_d2, r
        # the median can never be flagged: at least half survive
        assert r.n_outliers <= r.n_vecs // 2, r
